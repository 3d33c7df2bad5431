package graft

import org.apache.spark.sql.functions._

import graft.api.Tuning

/** Tuning's formulas must EQUAL the in-plan derivations the queries run —
  * an advisory surface that drifts from the plans is worse than none. */
class TuningSpec extends SparkSpec {

  test("ivfCells equals the semDedup in-plan ceil-sqrt derivation") {
    for (n <- Seq(1L, 2L, 100L, 101L, 2000L, 999983L)) {
      val planK = spark.range(n)
        .agg(ceil(sqrt(count(lit(1)).cast("double"))).cast("long").as("kcells"))
        .head().getLong(0)
      assert(Tuning.ivfCells(n).toLong == planK,
        s"n=$n: Tuning ${Tuning.ivfCells(n)} != plan $planK")
    }
  }

  test("bloomBits equals the in-plan greatest(floor, 16*keys) sizing") {
    for (n <- Seq(0L, 1L, 1023L, 1024L, 1025L, 3000000L)) {
      val planM = spark.range(n)
        .agg(greatest(lit(16384L), count(lit(1)) * 16L).as("m"))
        .head().getLong(0)
      assert(Tuning.bloomBits(n) == planM,
        s"keys=$n: Tuning ${Tuning.bloomBits(n)} != plan $planM")
    }
  }

  test("saltFactor reproduces every q_key_skew salt factor") {
    val counts = graft.core.Tables.documents(spark, sfDir)
      .select(explode(graft.queries.Qdsl.words(col("text"))).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val nKeys = counts.size.toLong
    val rows = graft.queries.Analytics.keySkew(spark, sfDir).collect()
    graft.core.Caches.release()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (key, factor) = (r.getString(1), r.getLong(4))
      assert(Tuning.saltFactor(counts(key), total, nKeys) == factor,
        s"key $key: Tuning != query ($factor)")
    }
  }

  test("lshBits hits the occupancy target minimally") {
    for (n <- Seq(100L, 2000L, 1000000L, 123456789L);
         occ <- Seq(8L, 32L, 64L)) {
      val bits = Tuning.lshBits(n, occ)
      val meanAt = n.toDouble / math.pow(2, bits)
      assert(meanAt <= occ, s"n=$n occ=$occ bits=$bits: mean $meanAt over target")
      if (bits > 1) {
        val meanAtLess = n.toDouble / math.pow(2, bits - 1)
        assert(meanAtLess > occ,
          s"n=$n occ=$occ: ${bits - 1} bits would already satisfy the target")
      }
    }
    // the shipped index: 2000 sf0.1 vectors at 6 bits measure 31.25 mean
    // occupancy (lsh_occupancy telemetry) — the formula lands exactly there
    assert(Tuning.lshBits(2000, 32) == 6)
  }

  test("sketch dials: band threshold brackets the measured flip, CMS sizes") {
    // the shipped dedup index (4 bands x 2 rows): t = 0.5 exactly —
    // inside the measured calibration flip (agreement >= 7 -> J 0.21,
    // 8 of 8 -> J 0.88 in BENCH telemetry)
    assert(math.abs(Tuning.minhashBandThreshold(4, 2) - 0.5) < 1e-12)
    // more bands catch LOWER-similarity pairs; longer bands raise the bar
    assert(Tuning.minhashBandThreshold(8, 2) <
      Tuning.minhashBandThreshold(4, 2))
    assert(Tuning.minhashBandThreshold(4, 4) >
      Tuning.minhashBandThreshold(4, 2))
    // the shipped CMS (1024 x 3) corresponds to ~0.27% mass error at
    // ~5% failure: the formulas round-trip to the shipped shape
    assert(Tuning.cmsWidth(math.E / 1024) == 1024)
    assert(Tuning.cmsDepth(0.05) == 3)
  }

  test("cluster knobs: monotone, floored at cores, clamped") {
    assert(Tuning.shufflePartitions(0L, 32) == 32, "idle floor is one per core")
    assert(Tuning.shufflePartitions(100L << 30, 32,
      targetPartitionBytes = 128L << 20) == 800)
    assert(Tuning.shufflePartitions(100L << 30, 2000) == 2000,
      "a big cluster's floor wins over byte-count")
    assert(Tuning.maxPartitionBytes(8L << 30, 4) == 512L << 20)
    assert(Tuning.maxPartitionBytes(1L << 30, 32) == 16L << 20, "floor")
    assert(Tuning.maxPartitionBytes(1L << 40, 1) == 1L << 30, "ceiling")
  }

  test("bucketCount: power of two, covers the table, monotone") {
    assert(Tuning.bucketCount(1L << 30) == 1, "one bucket at one target")
    assert(Tuning.bucketCount((1L << 30) + 1) == 2, "rounds up")
    assert(Tuning.bucketCount(100L << 40) == 1 << 17,
      "100 TB at 1 GB/bucket is 2^17")
    for (bytes <- Seq(1L << 20, 5L << 30, 700L << 30, 3L << 40)) {
      val n = Tuning.bucketCount(bytes)
      assert((n & (n - 1)) == 0, s"$n not a power of two")
      assert(n.toLong * (1L << 30) >= bytes, s"$n buckets under-cover $bytes")
      assert(n <= 2 * ((bytes >> 30) + 1), s"$n buckets over-provision $bytes")
    }
  }

  test("snapshot-table dials: compaction target and retention depth") {
    assert(Tuning.compactTargetFiles(1L << 30) == 1)
    assert(Tuning.compactTargetFiles((1L << 30) + 1) == 2, "rounds up")
    assert(Tuning.compactTargetFiles(100L << 40) == 102400,
      "100 TB at 1 GB/file")
    assert(Tuning.snapshotRetainVersions(7) == 7L * 1440L)
    assert(Tuning.snapshotRetainVersions(0) == 2L,
      "never vacuum up to the in-flight edge")
  }
}

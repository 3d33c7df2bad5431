package graft

import graft.queries.Similarity

/** Invariants for the embedding similarity operators at sf0.001. */
class SimilaritySpec extends SparkSpec {

  test("brute kNN: 5 contiguous ranks per query, no self-matches") {
    val rows = Similarity.knnBrute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      assert(rs.forall(_._3 != q), "no self neighbor")
    }
  }

  test("ANN results are a subset of each query's bucket and never self") {
    val rows = Similarity.annLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).distinct.length === rs.length, "ranks unique per query")
      assert(rs.forall(_._3 != q))
    }
  }

  test("multi-table LSH recall dominates single-table per query") {
    def hits(ann: org.apache.spark.sql.DataFrame): Map[Long, Int] = {
      val truth = Similarity.knnBrute(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("rank") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val got = ann.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (q, t) =>
        q -> got.getOrElse(q, Set.empty).count(t)
      }
    }
    val single = hits(Similarity.annLsh(spark, sfDir))
    val multi = hits(Similarity.annLshMulti(spark, sfDir))
    graft.core.Caches.release()
    // table 0 of the multi index IS the single-table index, so the multi
    // candidate set is a per-query superset; under identical exact-cosine
    // ranking, recall@3 is monotone in the candidate set — any candidate
    // displacing a true-top-3 hit ranks above it, hence is itself a
    // true-top-3 member
    single.keys.foreach { q =>
      assert(multi(q) >= single(q),
        s"query $q: multi ${multi(q)} < single ${single(q)}")
    }
    // and the repair must actually repair something on this fixture
    assert(multi.values.sum > single.values.sum,
      s"multi-table index recovered nothing new: $multi vs $single")
  }

  test("multi-probe LSH recall dominates single-probe per query, zero extra index") {
    def hits(ann: org.apache.spark.sql.DataFrame): Map[Long, Int] = {
      val truth = Similarity.knnBrute(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("rank") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val got = ann.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (q, t) =>
        q -> got.getOrElse(q, Set.empty).count(t)
      }
    }
    val single = hits(Similarity.annLsh(spark, sfDir))
    val probed = hits(Similarity.annLshMultiProbe(spark, sfDir))
    graft.core.Caches.release()
    // flip=0 probes the query's own bucket, so the probe candidate set is
    // a per-query superset of the single-probe set; identical exact-cosine
    // ranking makes recall@3 monotone in the candidate set
    single.keys.foreach { q =>
      assert(probed(q) >= single(q),
        s"query $q: multiprobe ${probed(q)} < single ${single(q)}")
    }
    assert(probed.values.sum > single.values.sum,
      s"Hamming-1 probing recovered nothing new: $probed vs $single")
  }

  test("PQ codes: complete, bounded, pivots self-encode, ADC finds real neighbors") {
    val codes = Similarity.pqCodes(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    graft.core.Caches.release()
    val n = codes.map(_._1).distinct.length
    // every vector carries exactly 8 codes, each in [0, 16)
    assert(codes.length == n * 8, s"${codes.length} codes for $n vectors")
    assert(codes.forall(c => c._3 >= 0 && c._3 < 16))
    // a codebook pivot's own subvector is at distance 0 from itself, so
    // each pivot self-encodes (ties impossible unless subvectors collide)
    codes.filter(_._1 < 16).foreach { case (vid, m, code) =>
      assert(code == vid, s"pivot $vid subspace $m encoded to $code")
    }
    // the ADC ranking recovers true neighbors well above chance
    val truth = Similarity.knnBrute(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Similarity.annPq(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    graft.core.Caches.release()
    val hits = truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t) }.sum
    assert(hits > 0, "PQ/ADC recovered no true top-3 neighbor at all")
  }

  test("trained PQ codebooks do not lose recall vs the pivot seeds") {
    def hitSum(ann: org.apache.spark.sql.DataFrame): Int = {
      val truth = Similarity.knnBrute(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("rank") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val got = ann.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t) }.sum
    }
    val seeded = hitSum(Similarity.annPq(spark, sfDir))
    val trained = hitSum(Similarity.annPqTrained(spark, sfDir))
    graft.core.Caches.release()
    // one Lloyd round lowers quantization error; on this fixture that
    // must not COST aggregate recall (no per-query guarantee exists —
    // the law is the training direction, pinned loosely)
    assert(trained >= seeded,
      s"Lloyd-refined codebooks lost recall: $trained < $seeded")
  }

  test("IVFPQ: well-formed ranks per query, real neighbors recovered") {
    val rows = Similarity.annIvfPq(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.core.Caches.release()
    val byQ = rows.groupBy(_._1)
    // every query reports at most 3 neighbors with dense distinct ranks
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1L to ranks.length), s"query $q ranks: $ranks")
      assert(rs.forall(_._3 != q), s"query $q returned itself")
    }
    assert(byQ.size > 10, s"only ${byQ.size} queries produced candidates")
    // the composed index still finds true neighbors
    val truth = Similarity.knnBrute(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    graft.core.Caches.release()
    val hits = rows.count { case (q, _, n) => truth.getOrElse(q, Set.empty)(n) }
    assert(hits > 0, "IVFPQ recovered no true top-3 neighbor at all")
  }

  test("bits axis: 12-bit signatures refine 6-bit buckets and thin occupancy") {
    // one row per bit width (6, 12): more bits must mean more, smaller
    // buckets — mean occupancy strictly falls, bucket count strictly
    // rises. The production scaling direction (SURVEY §10: 16+ bits at
    // 100 TB) demonstrated on a real corpus rather than asserted.
    val occ = Similarity.lshOccupancy(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(occ.keySet == Set(6L, 12L))
    val (b6, n6, m6) = occ(6L)
    val (b12, n12, m12) = occ(12L)
    assert(n6 == n12, "same corpus censused at both widths")
    assert(b12 > b6, s"12-bit bucket count $b12 should exceed 6-bit $b6")
    assert(m12 < m6, s"12-bit mean occupancy $m12 should be below 6-bit $m6")
  }

  test("lshWeight stays in [-1000, 1000] and is deterministic") {
    val w1 = for (b <- 0 until 6; d <- 1 to 64) yield Similarity.lshWeight(b, d)
    val w2 = for (b <- 0 until 6; d <- 1 to 64) yield Similarity.lshWeight(b, d)
    assert(w1 === w2)
    assert(w1.forall(w => w >= -1000 && w <= 1000))
    assert(w1.distinct.length > 100, "weights should be well spread")
  }

  test("IVF recall is monotone in nprobe and exact at nprobe = k") {
    val truth = Similarity.knnBrute(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("rank") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def got(nprobe: Int): Map[Long, Set[Long]] =
      Similarity.annIvfProbes(spark, sfDir, nprobe)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val byP = Seq(1, 2, 4, 8).map(p => p -> got(p)).toMap
    graft.core.Caches.release()
    // probe sets are nested (rn <= p) and ranking is identical exact
    // cosine, so per-query hits are monotone in nprobe...
    truth.keys.foreach { q =>
      def hits(p: Int) = byP(p).getOrElse(q, Set.empty).count(truth(q))
      assert(hits(1) <= hits(2) && hits(2) <= hits(4) && hits(4) <= hits(8),
        s"query $q: hits not monotone in nprobe")
      // ...and at nprobe = k (all 8 cells) the candidate set is the whole
      // index minus self: IVF degenerates to brute force EXACTLY — same
      // top-3, not merely recall 1.0 (tie-break order matches knnBrute)
      assert(byP(8)(q) == truth(q),
        s"query $q: nprobe=8 ${byP(8)(q)} != brute ${truth(q)}")
    }
  }

  test("ivfAppend census partitions the corpus and keeps seeds resident") {
    val rows = Similarity.ivfAppend(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    graft.core.Caches.release()
    val n = graft.core.Tables.embeddings(spark, sfDir).count()
    // every vector lands in exactly one cell, on one side of the split
    assert(rows.map(r => r._2 + r._3).sum == n)
    assert(rows.map(_._3).sum > 0, "the arriving batch must be non-empty")
    // the 8 seed vectors self-assign at distance 0, so every cell keeps
    // at least its own seed resident — a cell with no residents would
    // mean the assignment drifted off the fixed centers
    assert(rows.length == 8 && rows.forall(_._2 >= 1), rows.mkString(", "))
    assert(rows.forall(r => r._4 >= 0 && r._5 >= 0), "integer dists non-negative")
  }

  test("IVF candidate cost grows with nprobe") {
    val cost = Similarity.ivfProbeCost(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cost.keySet == Set(1L, 2L, 4L))
    // more probed cells always means strictly more scored candidates on a
    // corpus with every cell populated — the cost half of the dial whose
    // recall half the monotonicity test pins
    assert(cost(1L) > 0.0, "every query scores someone at nprobe=1")
    assert(cost(1L) < cost(2L) && cost(2L) < cost(4L),
      s"candidate cost not increasing: $cost")
  }

  test("kmeans assignment covers every vector exactly once") {
    val rows = Similarity.kmeansAssign(spark, sfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    val n = graft.core.Tables.embeddings(spark, sfDir).count()
    assert(total === n)
  }
}

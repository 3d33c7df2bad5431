package graft

import org.apache.spark.sql.functions._

import graft.api.Boundaries

/** Median-of-nodes boundary decision (BoundaryDecider.cc parity) and
  * disk-backed boundary list round-trips.
  */
class BoundariesSpec extends SparkSpec {
  import spark.implicits._

  test("decider picks the lower median across nodes, reference-style") {
    // three nodes propose candidates for two boundary indices; the lower
    // median of [10, 20, 90] is 20 (index (3-1)/2 = 1 after sorting) —
    // the node with the skewed sample (90) cannot drag the boundary
    val cands = Seq(
      (0, 1, 10L), (1, 1, 20L), (2, 1, 90L),
      (0, 2, 50L), (1, 2, 40L), (2, 2, 60L)
    ).toDF("node", "idx", "key")
    val decided = Boundaries.decideBoundaries(cands)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(decided == Map(1 -> 20L, 2 -> 50L))
  }

  test("even node counts use candidate (n-1) DIV 2, ties broken by node") {
    val cands = Seq(
      (0, 1, 10L), (1, 1, 30L), (2, 1, 20L), (3, 1, 40L)
    ).toDF("node", "idx", "key")
    // sorted: 10,20,30,40 → lower median index (4-1)/2 = 1 → 20
    val decided = Boundaries.decideBoundaries(cands).collect()
    assert(decided.head.getLong(1) == 20L)
  }

  test("full pipeline partitions a skewed table into bounded ranges") {
    val df = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .repartition(4) // 4 "nodes"
    val bounds = Boundaries.computeBoundaries(df, "l_partkey", 8)
      .collect().map(_.getLong(1)).sorted
    assert(bounds.length == 7)
    val placed = Boundaries.repartitionByBoundaries(
      df, "l_partkey", bounds.map(_.asInstanceOf[Any]).toSeq)
    // every physical partition holds one contiguous key range
    val ranges = placed
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"),
        col("l_partkey"))
      .groupBy(col("pid"))
      .agg(min(col("l_partkey")).as("lo"), max(col("l_partkey")).as("hi"),
        count(lit(1)).as("n"))
      .orderBy(col("pid"))
      .collect()
    assert(ranges.map(_.getLong(3)).sum == df.count())
    val nonEmpty = ranges.filter(_.getLong(3) > 0)
    nonEmpty.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1),
        s"ranges overlap: pid ${a.getInt(0)} hi=${a.getLong(2)} vs pid ${b.getInt(0)} lo=${b.getLong(1)}")
      case _ =>
    }
    // and the placement matches the assignment expression (recomputed —
    // the helper column is dropped from the returned frame)
    val mismatch = placed
      .withColumn("actual", org.apache.spark.sql.functions.spark_partition_id())
      .withColumn("expected", Boundaries.partitionIdExpr(
        col("l_partkey"), bounds.map(_.asInstanceOf[Any]).toSeq))
      .filter(col("actual") =!= col("expected"))
    assert(mismatch.count() == 0)
    // the helper column does not leak into the caller's schema
    assert(placed.columns.toSeq == df.columns.toSeq)
  }

  test("byte-weighted boundaries balance bytes, not rows (BoundaryScanner)") {
    // adversarial size skew: low keys are 100x heavier than high keys —
    // row-count tiles would split rows evenly and give the low-key
    // partitions 100x the bytes; byte-weighted cuts must not
    val df = spark.range(10000)
      .select(col("id").as("k"),
        when(col("id") < 1000, 1000L).otherwise(10L).as("bytes"))
      .repartition(4)
    val bounds = Boundaries.decideBoundaries(
      Boundaries.candidateBoundariesWeighted(df, "k", "bytes", 8))
      .collect().map(_.getLong(1)).sorted
    assert(bounds.length == 7)
    val withPid = df.withColumn("pid",
      Boundaries.partitionIdExpr(col("k"), bounds.map(_.asInstanceOf[Any]).toSeq))
    val perPart = withPid.groupBy(col("pid"))
      .agg(sum(col("bytes")).as("b")).collect().map(_.getLong(1))
    val mean = perPart.sum.toDouble / perPart.length
    assert(perPart.forall(b => b < mean * 2.5),
      s"byte imbalance: ${perPart.mkString(",")} vs mean $mean")
    // row-count boundaries on the same data DO concentrate bytes — the
    // contrast that justifies the weighted variant
    val rowBounds = Boundaries.computeBoundaries(df, "k", 8)
      .collect().map(_.getLong(1)).sorted
    val rowPerPart = df.withColumn("pid",
        Boundaries.partitionIdExpr(col("k"), rowBounds.map(_.asInstanceOf[Any]).toSeq))
      .groupBy(col("pid")).agg(sum(col("bytes")).as("b"))
      .collect().map(_.getLong(1))
    assert(rowPerPart.exists(b => b > mean * 2.5),
      "row-count tiles unexpectedly balanced the skewed bytes")
  }

  test("suggestPartitions sizes by the intermediate:input ratio") {
    // 100 GB input inflating 3x, 1 GB target partitions -> 300
    assert(Boundaries.suggestPartitions(100L << 30, 3.0, 1L << 30) == 300)
    assert(Boundaries.suggestPartitions(1L << 20, 0.1, 1L << 30) == 1)
  }

  test("property: decided boundaries are sorted and assignment is monotone") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // 20 deterministic random key sets: boundaries must come out sorted,
    // and the partition id must be monotone in the key with every
    // partition index in range — the laws any range partitioner owes
    val gen = Gen.listOfN(20, Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L)))
    val cases = gen.apply(Gen.Parameters.default, Seed(7L)).get
      .filter(_.distinct.size >= 16)
    assert(cases.nonEmpty)
    cases.take(5).foreach { keys =>
      val df = spark.createDataFrame(
        keys.map(k => Tuple1(k)).toDF("k").rdd, // force a stable schema
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.LongType)).repartition(3)
      val bounds = Boundaries.computeBoundaries(df, "k", 8)
        .collect().map(_.getLong(1))
      assert(bounds.sorted.sameElements(bounds.sortBy(identity)),
        "boundaries sorted")
      val sortedBounds = bounds.sorted.map(_.asInstanceOf[Any]).toSeq
      val assigned = df
        .withColumn("pid", Boundaries.partitionIdExpr(col("k"), sortedBounds))
        .orderBy(col("k")).collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assigned.sliding(2).foreach {
        case Array((k1, p1), (k2, p2)) =>
          assert(p1 <= p2, s"pid not monotone: ($k1,$p1) then ($k2,$p2)")
        case _ =>
      }
      assert(assigned.forall { case (_, p) => p >= 0 && p <= sortedBounds.size })
    }
  }

  test("partitionIdExpr binary-searches: O(log P) comparisons on 1e5 bounds") {
    // counting comparator wrapped around the real interpreted ordering:
    // lower-bound search over 100k boundaries must touch ≤ ceil(log2 P)+1
    // comparisons — the KeyList::findLowerBound bound — not O(P)
    val n = 100000
    val bounds = Array.tabulate[AnyRef](n)(i => java.lang.Long.valueOf(i * 10L))
    var comparisons = 0L
    val counting = new Ordering[AnyRef] {
      override def compare(a: AnyRef, b: AnyRef): Int = {
        comparisons += 1
        java.lang.Long.compare(
          a.asInstanceOf[java.lang.Long], b.asInstanceOf[java.lang.Long])
      }
    }
    val maxPerLookup = math.ceil(math.log(n.toDouble) / math.log(2.0)).toLong + 1
    val probes = Seq(-5L, 0L, 5L, 499995L, 999990L, 1000005L, 123457L)
    probes.foreach { k =>
      comparisons = 0
      val pid = graft.functions.GraftBoundaryId.search(
        java.lang.Long.valueOf(k), bounds, counting)
      // ground truth: count of bounds <= k
      val expected = bounds.count(_.asInstanceOf[java.lang.Long] <= k)
      assert(pid == expected, s"wrong pid for key $k")
      assert(comparisons <= maxPerLookup,
        s"key $k took $comparisons comparisons; O(log P) bound is $maxPerLookup")
    }
  }

  test("partitionIdExpr matches the filter-count semantics exactly (fuzz)") {
    // the binary-search expression must be value-identical to the naive
    // count-of-bounds<=key form it replaced, including keys equal to a
    // boundary, below the min, and above the max
    val bounds = Seq(10L, 20L, 20L, 50L, 90L).map(_.asInstanceOf[Any])
    val keys = (-5L to 100L).toSeq
    val df = keys.toDF("k")
    val got = df.select(col("k"),
        Boundaries.partitionIdExpr(col("k"), bounds).as("pid"),
        size(filter(array(bounds.map(lit): _*), b => b <= col("k"))).as("naive"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"key ${r.getLong(0)}: binary-search pid ${r.getInt(1)} != naive ${r.getInt(2)}")
    }
  }

  test("partitionIdExpr handles string keys through codegen") {
    val bounds = Seq("banana", "mango", "peach").map(_.asInstanceOf[Any])
    val df = Seq("apple", "banana", "cherry", "mango", "melon", "zebra").toDF("s")
    val got = df.select(col("s"),
        Boundaries.partitionIdExpr(col("s"), bounds).as("pid"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("apple" -> 0, "banana" -> 1, "cherry" -> 1,
      "mango" -> 2, "melon" -> 2, "zebra" -> 3))
    // and a null key stays null, not partition 0
    val withNull = Seq(Some("kiwi"), None).toDF("s")
      .select(Boundaries.partitionIdExpr(col("s"), bounds).as("pid"))
      .collect()
    assert(withNull.exists(_.isNullAt(0)))
  }

  test("boundary list survives a disk round-trip (DiskBackedBoundaryKeyList)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bounds").toString
    val df = graft.core.Tables.orders(spark, sfDir).repartition(3)
    val decided = Boundaries.computeBoundaries(df, "o_orderkey", 5)
    Boundaries.save(decided, s"$dir/bounds")
    val loaded = Boundaries.load(spark, s"$dir/bounds")
    val inMem = decided.orderBy(col("idx")).collect().map(_.get(1))
    assert(loaded.toSeq == inMem.toSeq)
  }
}

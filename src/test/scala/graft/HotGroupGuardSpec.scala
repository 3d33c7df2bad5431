package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.Corpus
import graft.queries.Analytics

/** The automatic hot-group straggler guard on the window family
  * (Analytics.winsorizeGuardedOf): a group 1000× its peers leaves the
  * per-group rank window for the distributed-rank path, value-identical,
  * with every window task bounded by a range slice instead of the hot
  * group's full population. */
class HotGroupGuardSpec extends SparkSpec {
  import spark.implicits._

  /** 3 cold groups × 40 rows + 1 hot group × 40_000 rows (1000×), values
    * deterministic and heavy-tailed enough that clipping engages. */
  private def skewed: DataFrame =
    (Seq.tabulate(3, 40) { (g, i) => (s"cold$g", (g * 1000 + i).toLong,
        BigDecimal((i * 7 % 97) + (if (i % 13 == 0) 500 else 0)).setScale(2)) }.flatten ++
      Seq.tabulate(40000) { i => ("hot", (100000 + i).toLong,
        BigDecimal((i * 31 % 9973) + (if (i % 997 == 0) 100000 else 0)).setScale(2)) })
      .toDF("grp", "rid", "v")
      .withColumn("v", col("v").cast("decimal(12,2)"))

  private def sortedRows(df: DataFrame) =
    df.orderBy("grp").collect().map(_.toSeq).toSeq

  test("guarded winsorize is value-identical to the plain window form") {
    val e = skewed
    val plain = Analytics.winsorizeOf(e)
    val guarded = Analytics.winsorizeGuardedOf(e, cap = 1000L)
    assert(sortedRows(guarded) === sortedRows(plain))
  }

  test("all-cold input takes the window path unchanged") {
    val e = skewed.filter(col("grp") =!= "hot")
    assert(sortedRows(Analytics.winsorizeGuardedOf(e, cap = 1000L)) ===
      sortedRows(Analytics.winsorizeOf(e)))
  }

  test("all-hot input (every group over cap) still matches") {
    val e = skewed
    assert(sortedRows(Analytics.winsorizeGuardedOf(e, cap = 10L)) ===
      sortedRows(Analytics.winsorizeOf(e)))
  }

  test("hot leg plans a range exchange and no full-group sort window") {
    val guarded = Analytics.winsorizeGuardedOf(skewed, cap = 1000L)
    val plan = guarded.queryExecution.executedPlan.toString
    // the distributed-rank path exists: rank windows keyed by
    // (slice, grp), global order restored by range partitioning
    assert(plan.toLowerCase.contains("rangepartitioning"))
    assert(plan.contains("pid"))
  }

  test("hot group's window tasks are bounded by the range slice") {
    // with shuffle.partitions = P, the 40k-row hot group must spread
    // over >1 slice (AQE coalesces 40k test rows into one partition —
    // at production slice sizes it leaves the range split alone, so
    // pin the structural claim with coalescing off)
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val ranked = skewed.filter(col("grp") === "hot")
        .repartitionByRange(col("grp"), col("v"), col("rid"))
        .withColumn("pid", spark_partition_id())
      val slices = ranked.groupBy(col("pid")).count()
        .agg(count(lit(1)).as("n_slices"), max(col("count")).as("max_slice"))
        .collect().head
      assert(slices.getLong(0) > 1, "hot group must span multiple slices")
      assert(slices.getLong(1) < 40000L, "no slice holds the whole hot group")
    } finally spark.conf.set(key, prev)
  }

  /** Click/purchase stream with one user owning 1000× the events of the
    * others — the order-carrying analog of the rank-window skew case. */
  private def skewedEvents: DataFrame = {
    def rows(uid: Long, n: Int, base: Long) = Seq.tabulate(n) { i =>
      val t = i % 5 match {
        case 0 | 3 => "click"
        case 1 | 4 => "purchase"
        case _ => "view"
      }
      (base + i, uid, t, 1000L + (i.toLong * 17 % 5000))
    }
    (rows(1L, 20, 0) ++ rows(2L, 20, 100) ++ rows(99L, 20000, 1000000))
      .toDF("event_id", "user_id", "event_type", "ms")
  }

  test("segmented as-of matches the per-user window scan on a 1000x user") {
    val ev = skewedEvents
    val seg = graft.queries.Temporal.asofSegmentedOf(ev)
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    // the plain per-user running-window form, inlined as the law
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ms"),
        when(col("event_type") === "click", 0).otherwise(1), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val clickId = when(col("event_type") === "click", col("event_id"))
    val clickMs = when(col("event_type") === "click", col("ms"))
    val plain = ev
      .withColumn("click_id", last(clickId, ignoreNulls = true).over(w))
      .withColumn("click_ms", last(clickMs, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("click_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ms").as("purchase_ms"),
        col("click_id"), col("click_ms"),
        (col("ms") - col("click_ms")).as("gap_ms"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(seg === plain)
  }

  test("segmented as-of carries clicks across slice boundaries") {
    // one user, clicks early, purchases late: with coalescing off the
    // range exchange splits the user across slices, so at least one
    // purchase must resolve through the carry, not the local window
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val n = 20000
      val ev = (Seq.tabulate(n) { i => (i.toLong, 7L, "click", i.toLong) } ++
        Seq.tabulate(n) { i =>
          (100000L + i, 7L, "purchase", 1000000L + i)
        }).toDF("event_id", "user_id", "event_type", "ms")
      val out = graft.queries.Temporal.asofSegmentedOf(ev)
      // every purchase sees the LAST click overall
      assert(out.count() === n.toLong)
      assert(out.agg(min(col("click_id"))).collect().head.getLong(0) ===
        (n - 1).toLong)
    } finally spark.conf.set(key, prev)
  }

  test("asof auto-split (hot + cold legs) matches the plain window form") {
    val ev = skewedEvents
    def rows(df: DataFrame) =
      df.orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(rows(graft.queries.Temporal.asofGuardedOf(ev, cap = 100L)) ===
      rows(graft.queries.Temporal.asofWindowOf(ev)))
  }

  test("segmented scd2 matches the window form on a 1000x user") {
    val ev = skewedEvents
      .select(col("user_id"), col("event_type"), col("ms"), col("event_id"))
    def rows(df: DataFrame) =
      df.orderBy("user_id", "version").collect().map(_.toSeq).toSeq
    val plain = rows(graft.queries.Temporal.scd2WindowOf(ev))
    assert(rows(graft.queries.Temporal.scd2SegmentedOf(ev)) === plain)
    // and the auto-split with a mixed cap
    assert(rows(graft.queries.Temporal.scd2GuardedOf(ev, cap = 100L)) === plain)
  }

  test("segmented scd2 carries state across slice boundaries") {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      // one user, 20k same-state events then one flip: the segmented lag
      // must NOT open a new version at each slice boundary
      val n = 20000
      val ev = (Seq.tabulate(n) { i => (7L, "view", i.toLong, i.toLong) } :+
        (7L, "click", 1000000L, 999999L))
        .toDF("user_id", "event_type", "ms", "event_id")
      val out = graft.queries.Temporal.scd2SegmentedOf(ev)
      assert(out.count() === 2L, "slice boundaries fabricated versions")
    } finally spark.conf.set(key, prev)
  }

  test("segmented funnel composes slice automata to the window answer") {
    val ev = skewedEvents
      .select(col("event_id"), col("user_id"), col("event_type"), col("ms"))
    def stages(df: DataFrame) =
      df.orderBy("user_id").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toSeq
    val plain = stages(graft.queries.Temporal.funnelStagesWindowOf(ev))
    assert(stages(graft.queries.Temporal.funnelSegmentedOf(ev)) === plain)
    // and the auto-split census end to end
    def census(df: DataFrame) =
      df.orderBy("stage").collect().map(_.toSeq).toSeq
    assert(census(graft.queries.Temporal.funnelGuardedOf(ev, cap = 100L)) ===
      census(graft.queries.Temporal.funnelCensus(
        graft.queries.Temporal.funnelStagesWindowOf(ev))))
  }

  test("funnel automaton carries stage credit across slice boundaries") {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      // views early, clicks mid, purchases late: each stage completes in
      // a DIFFERENT slice region, so depth 3 requires cross-slice credit
      val n = 6000
      val ev = (Seq.tabulate(n) { i => (i.toLong, 7L, "view", i.toLong) } ++
        Seq.tabulate(n) { i =>
          (10000L + i, 7L, "click", 100000L + i)
        } ++
        Seq.tabulate(n) { i =>
          (20000L + i, 7L, "purchase", 200000L + i)
        }).toDF("event_id", "user_id", "event_type", "ms")
      val got = graft.queries.Temporal.funnelSegmentedOf(ev).collect()
      assert(got.length === 1 && got.head.getInt(1) === 3,
        s"expected stage 3, got ${got.toSeq}")
    } finally spark.conf.set(key, prev)
  }

  test("segmented sessionize matches the window form on a 1000x user") {
    // sessions need ms gaps around the 6h threshold
    def evRows(uid: Long, n: Int, base: Long) = Seq.tabulate(n) { i =>
      // every 10th event jumps past the gap: multiple sessions per user
      val ms = base + i * 60000L + (i / 10) * 30000000L
      (uid, ms, BigDecimal((i % 50) + 1).setScale(2))
    }
    val ev = (evRows(1L, 30, 0) ++ evRows(2L, 30, 500) ++
      evRows(99L, 30000, 1000000))
      .toDF("user_id", "ms", "value")
    def rows(df: DataFrame) =
      df.orderBy("user_id", "start_ms").collect().map(_.toSeq).toSeq
    val plain = rows(graft.queries.ThemisOps.sessionizeWindowOf(ev))
    assert(rows(graft.queries.ThemisOps.sessionizeSegmentedOf(ev)) === plain)
    assert(rows(graft.queries.ThemisOps.sessionizeGuardedOf(ev, cap = 100L))
      === plain)
  }

  test("a session spanning a slice boundary is not split") {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      // ONE session: 40k events 1ms apart — slices must stitch it back
      val n = 40000
      val ev = Seq.tabulate(n) { i =>
        (7L, i.toLong, BigDecimal(1).setScale(2))
      }.toDF("user_id", "ms", "value")
      val out = graft.queries.ThemisOps.sessionizeSegmentedOf(ev).collect()
      assert(out.length === 1, s"one session expected, got ${out.length}")
      assert(out.head.getLong(3) === n.toLong)
    } finally spark.conf.set(key, prev)
  }

  test("a hot NULL key diverts and stays value-identical (all guards)") {
    // the hot user becomes NULL: membership and the segmented carries
    // must treat NULL as a real (and here, hot) group
    val evN = skewedEvents.withColumn("user_id",
      when(col("user_id") === 99L, lit(null)).otherwise(col("user_id")))
    def rs(df: DataFrame, sort: String*) =
      df.orderBy(sort.map(col): _*).collect().map(_.toSeq).toSeq
    // asof: segmented leg alone must reproduce the window form on nulls
    assert(rs(graft.queries.Temporal.asofSegmentedOf(evN), "event_id") ===
      rs(graft.queries.Temporal.asofWindowOf(evN), "event_id"))
    assert(rs(graft.queries.Temporal.asofGuardedOf(evN, cap = 100L), "event_id")
      === rs(graft.queries.Temporal.asofWindowOf(evN), "event_id"))
    // scd2
    val sevN = evN.select(col("user_id"), col("event_type"), col("ms"),
      col("event_id"))
    assert(rs(graft.queries.Temporal.scd2GuardedOf(sevN, cap = 100L),
      "user_id", "version") ===
      rs(graft.queries.Temporal.scd2WindowOf(sevN), "user_id", "version"))
    // sessionize
    val zevN = evN.select(col("user_id"), col("ms"),
      lit(BigDecimal(1).setScale(2)).as("value"))
    assert(rs(graft.queries.ThemisOps.sessionizeGuardedOf(zevN, cap = 100L),
      "user_id", "start_ms") ===
      rs(graft.queries.ThemisOps.sessionizeWindowOf(zevN),
        "user_id", "start_ms"))
    // winsorize with a hot NULL group
    val wN = skewed.withColumn("grp",
      when(col("grp") === "hot", lit(null)).otherwise(col("grp")))
    assert(rs(graft.queries.Analytics.winsorizeGuardedOf(wN, cap = 1000L),
      "grp") === rs(graft.queries.Analytics.winsorizeOf(wN), "grp"))
    // funnel
    assert(rs(graft.queries.Temporal.funnelGuardedOf(evN, cap = 100L),
      "stage") === rs(graft.queries.Temporal.funnelCensus(
        graft.queries.Temporal.funnelStagesWindowOf(evN)), "stage"))
  }

  /** Packing frame with one language holding ~all rows (1000×) — the
    * low-cardinality-stratum case the per-lang cumsum window serializes. */
  private def skewedPack: DataFrame =
    (Seq.tabulate(3, 40) { (g, i) =>
      (s"cold$g", (g * 1000 + i).toLong, (i % 37 + 1).toLong)
    }.flatten ++ Seq.tabulate(40000) { i =>
      ("hot", (100000 + i).toLong, (i % 211 + 1).toLong)
    }).toDF("lang", "doc_id", "n_tok")

  private def packCensus(cum: DataFrame) =
    cum.withColumn("bin", expr("(cum - 1) DIV 4096"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("lang", "bin").collect().map(_.toSeq).toSeq

  test("guarded lang cumsum matches the window form on a 1000x language") {
    val d = skewedPack
    val plain = packCensus(graft.queries.TextPipeline.langCumsumOf(d))
    assert(packCensus(
      graft.queries.TextPipeline.langCumsumGuardedOf(d, cap = 100L)) === plain)
    // all-hot (every language over cap) still matches
    assert(packCensus(
      graft.queries.TextPipeline.langCumsumGuardedOf(d, cap = 10L)) === plain)
    // all-cold input takes the window path unchanged
    val cold = d.filter(col("lang") =!= "hot")
    assert(packCensus(
      graft.queries.TextPipeline.langCumsumGuardedOf(cold, cap = 100L)) ===
      packCensus(graft.queries.TextPipeline.langCumsumOf(cold)))
  }

  test("hot-language cumsum is exact across slice boundaries") {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      // ONE language, 40k one-token docs: the range exchange splits it
      // over many slices, and the offset-stitched cumsum must still cut
      // bins at EXACTLY 4096 tokens — any slice-boundary drift changes
      // a bin census immediately
      val n = 40000
      val d = Seq.tabulate(n) { i => ("en", i.toLong, 1L) }
        .toDF("lang", "doc_id", "n_tok")
      val ranked = d.repartitionByRange(col("lang"), col("doc_id"))
        .withColumn("pid", spark_partition_id())
      val slices = ranked.groupBy(col("pid")).count().count()
      assert(slices > 1, "hot language must span multiple slices")
      val bins = packCensus(
        graft.queries.TextPipeline.langCumsumGuardedOf(d, cap = 100L))
      assert(bins.length === (n + 4095) / 4096)
      assert(bins.init.forall(_(3) == 4096L),
        "every full bin must hold exactly 4096 tokens")
    } finally spark.conf.set(key, prev)
  }

  test("a hot NULL language diverts and stays value-identical") {
    val d = skewedPack.withColumn("lang",
      when(col("lang") === "hot", lit(null)).otherwise(col("lang")))
    assert(packCensus(
      graft.queries.TextPipeline.langCumsumGuardedOf(d, cap = 100L)) ===
      packCensus(graft.queries.TextPipeline.langCumsumOf(d)))
  }

  /** SemDeDup assigned frame with one 1200-member hot cell (a planted
    * near-dup storm) and 4 cold 30-member cells. Two direction classes
    * (axis-0-dominant / axis-1-dominant) so within-class cosines ≈ 1 and
    * cross-class ≈ 0 — the 0.9 threshold separates them exactly. */
  private def semAssigned: DataFrame = {
    def vec(i: Int): Seq[Long] =
      if (i % 2 == 0) Seq(1000000L + i, i.toLong, 7L, 0L)
      else Seq(i.toLong, 1000000L + i, 0L, 7L)
    val rows =
      (for { c <- 0L until 4L; i <- 0 until 30 }
        yield (c * 1000 + i, vec(i), c)) ++
        (for { i <- 0 until 1200 } yield (100000L + i, vec(i), 9L))
    rows.toDF("vec_id", "v", "cell")
      .withColumn("n2",
        expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0L, (a, x) -> a + x)"))
  }

  /** The plain single-key within-cell pair scan — the law the guard must
    * reproduce (the semDedup join shape before the r13 guard). */
  private def semPlainDropped(assigned: DataFrame, minCos: Double) =
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"), col("a.v").as("av"),
        col("b.v").as("bv"), col("a.n2").as("an2"), col("b.n2").as("bn2"))
      .filter(expr(
        "CAST(aggregate(zip_with(av, bv, (x, y) -> x * y), 0L, (a, x) -> a + x)" +
          " AS DOUBLE) / sqrt(CAST(an2 AS DOUBLE)) / sqrt(CAST(bn2 AS DOUBLE))")
        >= minCos)
      .select(col("vec_id")).distinct()

  private def droppedIds(df: DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq

  test("block-decomposed semdedup pair scan matches the single-key join") {
    val a = semAssigned
    val plain = droppedIds(semPlainDropped(a, 0.9))
    assert(plain.nonEmpty, "the planted storm must produce drops")
    val guarded = droppedIds(
      graft.queries.Similarity.semDroppedOf(a, 0.9, cap = 100L, blockRows = 64L))
    assert(guarded === plain)
    // all-hot (every cell over cap, incl. the 30-member ones) still matches
    assert(droppedIds(graft.queries.Similarity.semDroppedOf(
      a, 0.9, cap = 10L, blockRows = 8L)) === plain)
    // all-cold input takes the single-key path unchanged
    val cold = a.filter(col("cell") =!= 9L)
    assert(droppedIds(graft.queries.Similarity.semDroppedOf(
      cold, 0.9, cap = 10000L, blockRows = 64L)) ===
      droppedIds(semPlainDropped(cold, 0.9)))
  }

  test("hot cell's pairs spread over multiple tile keys") {
    // the structural claim: a 1200-member cell at blockRows=64 hashes
    // into B=19 blocks, so the pair join sees 190 tile keys, not 1
    val a = semAssigned
    val hot = a.filter(col("cell") === 9L)
      .withColumn("__b", lit(19L))
      .withColumn("__blk", pmod(xxhash64(col("vec_id")), col("__b")))
    val nBlocks = hot.select(col("__blk")).distinct().count()
    assert(nBlocks > 1, "hash blocking must actually split the hot cell")
  }

  test("Corpus.winsorize facade applies the guard automatically") {
    val df = skewed.toDF("g", "id", "val")
    val out = Corpus.winsorize(df, "g", "val", "id", hotCap = 1000L)
    val plain = Analytics.winsorizeOf(
      df.select(col("g").cast("string").as("grp"),
        col("id").cast("long").as("rid"),
        col("val").cast("decimal(12,2)").as("v")))
    assert(out.columns.head === "g")
    assert(sortedRows(out.withColumnRenamed("g", "grp")) === sortedRows(plain))
  }
}

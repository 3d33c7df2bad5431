package graft

import org.apache.spark.sql.functions._

import graft.queries.Temporal

/** Temporal-operator semantics: the as-of join must behave like the
  * textbook definition (latest click at-or-before, none in between), and
  * the banded range join must agree with the naive inequality join it
  * replaces at scale.
  */
class TemporalSpec extends SparkSpec {

  test("asof join picks the latest preceding click and nothing later") {
    val out = Temporal.asofJoin(spark, sfDir).persist()
    try {
      assert(out.count() > 0)
      // at-or-before, never negative
      assert(out.filter(col("gap_ms") < 0).count() == 0)
      // no click by the same user strictly between the matched click and
      // the purchase — i.e. the match really is the LATEST preceding one
      val clicks = graft.core.Tables.events(spark, sfDir)
        .filter(col("event_type") === "click")
        .select(col("user_id").as("cu"),
          graft.queries.Qdsl.epochMs(col("ts")).as("cms"))
      val violated = out.join(clicks,
        col("cu") === col("user_id") &&
          col("cms") > col("click_ms") && col("cms") <= col("purchase_ms"))
      assert(violated.count() == 0,
        "a later click existed between the matched click and the purchase")
    } finally out.unpersist()
  }

  test("banded range join equals the naive inequality join") {
    val banded = Temporal.rangeJoin(spark, sfDir)
    // brute force: no bucketing, pure inequality theta-join (the shape
    // that does NOT scale — correct at sf0.001, used as ground truth)
    val e = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("value"),
        graft.queries.Qdsl.epochMs(col("ts")).as("ms"))
    val w = spark.range(100)
      .select(col("id").as("win_id"),
        (lit(1704067200000L) + col("id") * 10800000L).as("start_ms"))
      .withColumn("end_ms", col("start_ms") + 18000000L)
    val naive = e.join(w,
        col("ms") >= col("start_ms") && col("ms") < col("end_ms"))
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        graft.queries.Qdsl.sumDec(col("value")).as("sum_value"))
    assert(banded.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(banded).count() == 0)
  }

  test("cube totals line up across grouping sets") {
    val out = Temporal.cubeOrders(spark, sfDir).persist()
    try {
      val total = out.filter(col("status") === "ALL" && col("priority") === "ALL")
        .select(col("n")).head().getLong(0)
      val byStatus = out.filter(col("status") =!= "ALL" && col("priority") === "ALL")
        .agg(sum(col("n"))).head().getLong(0)
      val byCell = out.filter(col("status") =!= "ALL" && col("priority") =!= "ALL")
        .agg(sum(col("n"))).head().getLong(0)
      assert(total == byStatus && total == byCell)
    } finally out.unpersist()
  }

  test("pivot columns cover every event type with consistent counts") {
    val out = Temporal.pivotEvents(spark, sfDir).persist()
    try {
      val types = Seq("click", "error", "purchase", "signup", "view")
      assert(types.flatMap(t => Seq(s"${t}_n", s"${t}_v"))
        .forall(out.columns.contains))
      val pivotTotal = out.agg(
        sum(types.map(t => col(s"${t}_n")).reduce(_ + _))).head().getLong(0)
      assert(pivotTotal == graft.core.Tables.events(spark, sfDir).count())
    } finally out.unpersist()
  }

  test("funnel stages match the naive per-stage recomputation") {
    import graft.queries.Qdsl.epochMs
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        epochMs(col("ts")).as("ms")).persist()
    try {
      // naive ground truth: stage 1 = has a view; stage 2 = has a click
      // strictly after (in (ms, event_id) order) some view; stage 3 = a
      // purchase after such a click — recomputed with joins, not windows
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(struct(col("ms"), col("event_id"))).as("v0"))
      val clicks = ev.filter(col("event_type") === "click")
        .join(views, "user_id")
        .filter(struct(col("ms"), col("event_id")) > col("v0"))
        .groupBy(col("user_id")).agg(min(struct(col("ms"), col("event_id"))).as("c0"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .join(clicks, "user_id")
        .filter(struct(col("ms"), col("event_id")) > col("c0"))
        .select(col("user_id")).distinct()
      val nAll = ev.select(col("user_id")).distinct().count()
      val n1 = views.count(); val n2 = clicks.count(); val n3 = purchases.count()
      val out = Temporal.funnel(spark, sfDir)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      def atLeast(k: Int) = out.filter(_._1 >= k).values.sum
      assert(atLeast(0) == nAll)
      assert(atLeast(1) == n1, s"stage>=1 ${atLeast(1)} vs naive $n1")
      assert(atLeast(2) == n2, s"stage>=2 ${atLeast(2)} vs naive $n2")
      assert(atLeast(3) == n3, s"stage>=3 ${atLeast(3)} vs naive $n3")
    } finally ev.unpersist()
  }

  test("histogram quantile bins equal the discrete order statistic's bin") {
    // the histogram computes the DISCRETE quantile (value at rank
    // ceil(q·n)); interpolated percentile() can sit many bins away on a
    // sparse tail, so the ground truth here is the order statistic itself
    val out = Temporal.histogramQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value"))
    val ranked = graft.core.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
    def discrete(q: Double) = ranked
      .filter(col("rk") === ceil(col("n") * q))
      .collect().map(r => r.getString(0) -> math.floor(r.getDouble(1) * 2).toLong).toMap
    val d50 = discrete(0.5); val d95 = discrete(0.95)
    out.foreach { case (t, (b50, b95)) =>
      assert(b50 == d50(t), s"$t p50 bin $b50 vs discrete ${d50(t)}")
      assert(b95 == d95(t), s"$t p95 bin $b95 vs discrete ${d95(t)}")
    }
  }

  test("resample grid is dense, zero-filled, and forward-fill is monotone") {
    val out = Temporal.resampleFill(spark, sfDir).persist()
    try {
      val nTypes = graft.core.Tables.events(spark, sfDir)
        .select(col("event_type")).distinct().count()
      assert(out.count() == 720 * nTypes)
      // empty hours are zero-filled, never dropped
      assert(out.filter(col("n_events") === 0 && col("sum_value") =!= 0.0).count() == 0)
      // totals survive the resample
      val total = out.agg(sum(col("n_events"))).head().getLong(0)
      assert(total == graft.core.Tables.events(spark, sfDir).count())
      // forward fill points at-or-before the row's hour, and is exactly
      // the row's own hour whenever the hour had events
      assert(out.filter(col("last_seen_hour") > col("hour")).count() == 0)
      assert(out.filter(col("n_events") > 0 &&
        col("last_seen_hour") =!= col("hour")).count() == 0)
    } finally out.unpersist()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.queries.Sketches

/** Sketch semantics: HLL's corrected estimate must actually approximate
  * the exact distinct count, and Count-Min must honor its one-sided error
  * guarantee (estimate ≥ truth, overcount bounded by the cell load).
  */
class SketchesSpec extends SparkSpec {

  test("HLL corrected estimate lands near the exact distinct count") {
    val out = Sketches.hllDistinct(spark, sfDir).persist()
    try {
      assert(out.count() > 0)
      val rows = out.select(col("n_exact"), col("est_final")).collect()
      rows.foreach { r =>
        val exact = r.getLong(0); val est = r.getLong(1)
        // linear-counting regime at this scale: well under 10% typical,
        // 25% is a loose bound that still catches broken register math
        assert(math.abs(est - exact) <= math.max(2L, exact / 4),
          s"estimate $est too far from exact $exact")
      }
    } finally out.unpersist()
  }

  test("HLL registers merge by max: union of halves = whole") {
    // mergeability is the property that makes per-shard sketches usable:
    // max-merge of two half-stream register sets must equal the
    // registers of the full stream. Recompute registers the same way the
    // query does, on user_id parity halves.
    import graft.queries.Qdsl.hash60
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), hash60(col("user_id")).as("h"))
      .select(col("user_id"), (col("h") % 256).as("j"), expr("h DIV 256").as("w"))
      .select(col("user_id"), col("j"),
        when(col("w") === 0, 53)
          .otherwise(lit(53) - length(conv(col("w"), 10, 2))).as("rho"))
      .persist()
    try {
      def regs(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("j")).agg(max(col("rho")).as("m"))
      val whole = regs(ev)
      val merged = regs(ev.filter(col("user_id") % 2 === 0))
        .union(regs(ev.filter(col("user_id") % 2 === 1)))
        .groupBy(col("j")).agg(max(col("m")).as("m"))
      assert(whole.exceptAll(merged).count() == 0)
      assert(merged.exceptAll(whole).count() == 0)
    } finally ev.unpersist()
  }

  test("split-sketch-merge census equals the one-shot sketch exactly") {
    def key(r: org.apache.spark.sql.Row) = r.getAs[String]("event_type")
    val whole = graft.queries.Sketches.hllDistinct(spark, sfDir).collect()
      .map(r => key(r) -> ((r.getAs[Long]("n_nonzero"),
        r.getAs[Long]("reg_checksum"), r.getAs[Long]("est_final")))).toMap
    val merged = graft.queries.Sketches.hllMerge(spark, sfDir).collect()
      .map(r => key(r) -> ((r.getAs[Long]("n_nonzero"),
        r.getAs[Long]("reg_checksum"), r.getAs[Long]("est_final")))).toMap
    // register-max is associative/commutative/idempotent: sketching the
    // two halves separately and merging MUST equal sketching the whole
    // stream, estimate included — bit-exact, not approximately
    assert(merged == whole, s"merge drifted from rebuild: $merged vs $whole")
  }

  test("CMS join-size estimate is one-sided above; correction tightens it") {
    val r = graft.queries.Sketches.cmsJoinSize(spark, sfDir).collect().head
    val (exact, est, worst, corrected) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))
    // non-negative counts: collisions only ADD, so every depth's inner
    // product — hence both min and max — sits at or above the truth
    assert(est >= exact, s"estimate $est below exact $exact")
    assert(worst >= est)
    // subtracting the expected collision mass F1a*F1b/w must move the
    // estimate closer to the truth than the raw inner product
    assert((corrected - exact).abs < (est - exact).abs,
      s"correction did not tighten: $corrected vs $est around $exact")
  }

  test("CMS estimates are one-sided and bounded by the cell load") {
    val out = Sketches.cmsWords(spark, sfDir).persist()
    try {
      assert(out.count() == 20)
      assert(out.filter(col("n_est") < col("n_exact")).count() == 0,
        "CMS must never underestimate")
      // expected overcount per cell ≈ N/width; 8× slack keeps the test
      // robust while still failing on e.g. a broken min or hash
      val n = graft.core.Tables.documents(spark, sfDir)
        .select(explode(graft.queries.Qdsl.words(col("text")))).count()
      val bound = math.max(4L, 8L * n / 1024)
      assert(out.filter(col("overcount") > bound).count() == 0,
        s"overcount exceeded $bound (N=$n)")
    } finally out.unpersist()
  }

  test("KMV union/intersection estimates land near the exact counts") {
    val r = graft.queries.Sketches.kmvIntersect(spark, sfDir).head()
    val estU = r.getAs[Long]("est_union")
    val exU = r.getAs[Long]("exact_union")
    val estI = r.getAs[Long]("est_inter")
    val exI = r.getAs[Long]("exact_inter")
    assert(exU > 0 && r.getAs[Long]("rho") > 0)
    // k = 64 → ~12.5% relative error; allow 3σ
    assert(math.abs(estU - exU) <= math.max(4, (0.4 * exU).toLong),
      s"union estimate $estU too far from exact $exU")
    assert(math.abs(estI - exI) <= math.max(4, (0.5 * exU).toLong),
      s"intersection estimate $estI too far from exact $exI (union $exU)")
    assert(estI <= estU)
  }
}

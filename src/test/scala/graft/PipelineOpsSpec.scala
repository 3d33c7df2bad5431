package graft

import org.apache.spark.sql.functions._

import graft.queries.{Relational, Similarity, Temporal, TextPipeline}

/** Property checks for the round-4 pipeline operators (each also
  * oracle-checked; these pin the semantic invariants the hash compare
  * alone wouldn't explain on failure).
  */
class PipelineOpsSpec extends SparkSpec {

  test("vocab ids are dense, rank-ordered, and count-sorted") {
    val out = TextPipeline.vocabBuild(spark, sfDir).orderBy(col("token_id")).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to out.length))
    val counts = out.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "counts must be non-increasing in id order")
  }

  test("packed bins respect the token budget except overlong carries") {
    val out = TextPipeline.packSequences(spark, sfDir).persist()
    try {
      // cumsum binning attributes a boundary-straddling document to its
      // ENDING bin, so a bin can exceed the budget by at most one
      // document's length (real packing splits the straddler there)
      val maxDoc = graft.core.Tables.documents(spark, sfDir)
        .select(size(graft.queries.Qdsl.words(col("text"))).cast("long").as("n"))
        .agg(max(col("n"))).head().getLong(0)
      assert(out.filter(col("tokens") >= 4096 + maxDoc).count() == 0)
      // bins partition the corpus: per-lang token totals must reconcile
      val packed = out.groupBy(col("lang"))
        .agg(sum(col("tokens")).as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val direct = graft.core.Tables.documents(spark, sfDir)
        .select(col("lang"),
          size(graft.queries.Qdsl.words(col("text"))).cast("long").as("n"))
        .groupBy(col("lang")).agg(sum(col("n")).as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(packed == direct)
    } finally out.unpersist()
  }

  test("quantized values stay within int8 range") {
    val out = Similarity.embedQuantize(spark, sfDir)
    assert(out.filter(col("q_peak") > 127 || col("q_peak") < -127).count() == 0)
    // per-vector q_sum is bounded by 127 x dim
    assert(out.filter(abs(col("q_min_sum")) > 127L * 64).count() == 0)
  }

  test("latest snapshot equals the window-based recompute") {
    import graft.queries.Qdsl.epochMs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ms").desc, col("event_id").desc)
    val naive = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), epochMs(col("ts")).as("ms"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("ms").as("last_ms"),
        col("event_id").as("last_event_id"))
    val snap = Temporal.latestSnapshot(spark, sfDir)
      .select(col("user_id"), col("last_ms"), col("last_event_id"))
    assert(snap.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(snap).count() == 0)
  }

  test("reconcile census accounts for every customer and order key") {
    val out = Relational.reconcile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCust = graft.core.Tables.customer(spark, sfDir).count()
    val nOrdKeys = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().count()
    assert(out.getOrElse("both", 0L) + out.getOrElse("customer_only", 0L) == nCust)
    assert(out.getOrElse("both", 0L) + out.getOrElse("order_only", 0L) == nOrdKeys)
  }

  test("incremental dedup never drops a novel document") {
    val out = TextPipeline.incrementalDedup(spark, sfDir)
    val batchTotal = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 7 === 0).count()
    val census = out.agg(sum(col("n_batch")), sum(col("n_dups"))).head()
    assert(census.getLong(0) == batchTotal)
    assert(census.getLong(1) <= batchTotal)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.queries.Mixing

/** Mixture-shaping laws: temperature sampling must keep the smallest
  * language whole and flatten larger ones monotonically; the token-budget
  * selection must land exactly on the budget boundary (met or straddled
  * by one document) and take a longest-first prefix.
  */
class MixingSpec extends SparkSpec {

  test("temperature mix keeps the smallest language whole, flattens the rest") {
    val rows = Mixing.temperatureMix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byN = rows.sortBy(_.getAs[Long]("n_total"))
    assert(byN.head.getAs[Long]("rate_pm") == 1000L,
      "smallest language must be kept whole")
    // rates are non-increasing in language size
    byN.sliding(2).foreach {
      case Array(small, big) =>
        assert(small.getAs[Long]("rate_pm") >= big.getAs[Long]("rate_pm"))
      case _ => // single-language corpus: nothing to compare
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
    }
  }

  test("shard manifest: totals, membership, and offsets match a driver replay") {
    import graft.queries.Qdsl
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), Qdsl.hash60(col("doc_id")).as("h"),
        size(Qdsl.words(col("text"))).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent replay of the manifest contract on the driver: shard by
    // h % 64, order by (h, doc_id), exclusive prefix-sum the token counts
    val expect = docs.groupBy { case (_, h, _) => h % 64 }
      .map { case (shard, ds) =>
        val ordered = ds.sortBy { case (id, h, _) => (h, id) }
        val offsets = ordered.map(_._3).scanLeft(0L)(_ + _).init
        shard -> (ordered.length.toLong, ordered.map(_._3).sum, offsets.sum)
      }
    val got = Mixing.shardManifest(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expect)
    // every document landed in exactly one shard
    assert(got.values.map(_._1).sum === docs.length.toLong)
  }

  test("token budget is met or straddled by exactly the boundary doc") {
    val out = Mixing.tokenBudget(spark, sfDir).persist()
    try {
      val total = out.agg(sum(col("n_tokens"))).head().getLong(0)
      val minSel = out.agg(min(col("min_tok"))).head().getLong(0)
      val corpusTotal = graft.core.Tables.documents(spark, sfDir)
        .select(size(graft.queries.Qdsl.words(col("text"))).cast("long").as("n_tok"))
        .agg(sum(col("n_tok"))).head().getLong(0)
      if (corpusTotal <= 10000L)
        // under-budget corpus: everything is selected
        assert(total == corpusTotal, s"under budget, expected all: $total")
      else {
        // the selection covers the budget...
        assert(total >= 10000L, s"budget not covered: $total")
        // ...and removing the straddler would drop below it
        assert(total - minSel < 10000L,
          s"selection overshoots by more than the boundary doc: $total, min=$minSel")
      }
      // longest-first prefix: every selected doc is at least as long as
      // the shortest selected one by construction; verify the shortest
      // UNSELECTED doc bound — no excluded doc is longer than minSel
      // except ties broken by doc_id
      val excludedLonger = graft.core.Tables.documents(spark, sfDir)
        .select(size(graft.queries.Qdsl.words(col("text"))).cast("long").as("n_tok"))
        .filter(col("n_tok") > minSel).count()
      val selectedAtLeast = out.agg(sum(col("n_docs"))).head().getLong(0)
      assert(excludedLonger <= selectedAtLeast,
        "a longer document was excluded while shorter ones were selected")
    } finally out.unpersist()
  }

  test("priority sampling: global draw is TakeOrdered, stratified draw is a group-limit window") {
    val pg = Mixing.prioritySample(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(pg.contains("TakeOrderedAndProject"),
      "global priority sample should top-k without a global sort")
    val ps = Mixing.prioritySampleStratified(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(ps.contains("WindowGroupLimit"),
      "stratified priority sample should prune per group before the window")
  }

  test("priority sampling: estimator stays within 3x of the true total at k=64/500") {
    val r = Mixing.prioritySample(spark, sfDir).collect()(0)
    val est = r.getAs[Double]("est_total"); val truth = r.getAs[Long]("true_total")
    assert(r.getAs[Long]("n_sample") == 64L)
    assert(est > truth / 3.0 && est < truth * 3.0,
      s"unbiased estimator implausibly far off: est=$est truth=$truth")
  }

  test("rendezvous resharding: assignments stay in range and movement is ~1/(n+1)") {
    val rows = Mixing.rendezvousShards(spark, sfDir).collect()
    val olds = rows.map(_.getAs[Long]("shard_old")).toSet
    assert(olds.subsetOf((0L to 7L).toSet), s"old shard out of range: $olds")
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    val moved = rows.map(_.getAs[Long]("n_moved")).sum
    assert(moved > 0 && moved < n / 4,
      s"HRW movement should be near n/9, got $moved of $n")
  }
}

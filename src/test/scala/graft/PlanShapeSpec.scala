package graft

import graft.queries.{Relational, Similarity, ThemisOps}

/** Physical-plan shape assertions — the 100 TB contract: filters reach the
  * parquet scan, small sides broadcast, aggregations partial-agg before
  * the shuffle, heavy expressions stay inside whole-stage codegen. A plan
  * regression here is a scale bug even when results stay correct. */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6: selective predicates are pushed to the parquet scan") {
    val p = plan(Relational.selectiveRevenue(spark, sfDir))
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_discount"))
  }

  test("q6: scan reads only the referenced columns") {
    val p = plan(Relational.selectiveRevenue(spark, sfDir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      s"column pruning failed: $readSchema")
  }

  test("q3: filtered customer dimension broadcasts") {
    val p = plan(Relational.topkOrders(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q3: top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.topkOrders(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q1: aggregation is partial before the exchange") {
    val p = plan(Relational.pricingSummary(spark, sfDir))
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0,
      "expected HashAggregate + Exchange in plan")
    assert(p.indexOf("HashAggregate", exchange) >= 0,
      "expected final HashAggregate after the shuffle")
  }

  test("global sort uses range partitioning (phase-0 sampling analog)") {
    val p = plan(Relational.sortGlobal(spark, sfDir))
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"))
  }

  test("wordcount: native explode, map-side combine, pruned scan, no UDFs") {
    val p = plan(ThemisOps.wordCount(spark, sfDir))
    assert(p.contains("Generate explode"), "tokenization must be a native generator")
    assert(p.contains("partial_count"), "map-side combine before the shuffle")
    assert(p.contains("ReadSchema: struct<text:string>"), "scan prunes to text only")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "no UDFs expected in the wordcount path")
  }

  test("kNN: query side broadcasts (no shuffle of the big side)") {
    val p = plan(Similarity.knnBrute(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("LSH ANN: bucket join is an equi-join, not a cartesian product") {
    val p = plan(Similarity.annLsh(spark, sfDir))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
  }

  test("minhash: no cartesian product, candidates from an equi-join") {
    val p = plan(graft.queries.TextPipeline.dedupMinhash(spark, sfDir))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("jaccard near-dup: block keys drive an equi-join") {
    val p = plan(graft.queries.TextPipeline.jaccardNeardup(spark, sfDir))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("IVF ANN: coarse centers and probes broadcast") {
    val p = plan(Similarity.annIvf(spark, sfDir))
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      "the only nested-loop join allowed is the broadcast center cross join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("tfidf: no pinned broadcast of the vocabulary-sized df table") {
    // the df (document-frequency) join must be left to AQE — a broadcast
    // HINT would pin a vocabulary-sized table into executors at 100 TB.
    // The logical plan must carry no user hint; the only broadcast the
    // optimizer may choose on its own is stats-based (fine at test scale).
    val df = graft.queries.TextPipeline.tfidfTop(spark, sfDir)
    val logical = df.queryExecution.logical.toString
    assert(!logical.contains("UnresolvedHint"), "no user broadcast hint")
    // and the corpus count is part of the plan (the n6 one-row aggregate),
    // not a driver-side count() action
    assert(logical.contains("n6"), "corpus size must be an in-plan aggregate")
  }

  test("sessionize_gap: session window aggregates without a global sort") {
    val p = plan(ThemisOps.sessionizeGap(spark, sfDir))
    assert(p.contains("SessionWindow") || p.contains("session_window"))
    assert(!p.contains("Sort [") || !p.contains("global"),
      "sessionization must stay partition-local")
  }

  test("q13: zero-order customers survive the outer join into the 0 bucket") {
    val dist = graft.queries.Relational.custDist(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = graft.core.Tables.customer(spark, sfDir).count()
    val withOrders = graft.core.Tables.orders(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("o_custkey")).distinct().count()
    // the LEFT join is the whole point of the shape: customers without
    // orders must appear as c_count = 0, exactly count(cust) - count(buyers)
    assert(dist.getOrElse(0L, 0L) == nCust - withOrders,
      s"zero bucket ${dist.get(0L)} != ${nCust - withOrders}")
    assert(dist.values.sum == nCust, "every customer in exactly one bucket")
  }
}

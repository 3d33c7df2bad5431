package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.{Analytics, Ingest, Qdsl}

/** Semantics of the analytics suite beyond what the DuckDB oracle pins:
  * Bloom filters must never produce false negatives, BFS layers must
  * partition the reachable set, retention must be self-consistent, and
  * the salted aggregation must be indistinguishable from the direct one.
  */
class AnalyticsSpec extends SparkSpec {

  test("bloom membership has zero false negatives and consistent census") {
    val row = Analytics.bloomMembership(spark, sfDir).head()
    val nPass = row.getAs[Long]("n_bloom_pass")
    val nTrue = row.getAs[Long]("n_true_match")
    val nFp = row.getAs[Long]("n_false_pos")
    // every true member passes the filter (the Bloom contract)
    assert(nPass >= nTrue, "bloom dropped a true member (false negative)")
    assert(nFp == nPass - nTrue)
    assert(row.getAs[Long]("n_probed") > 0 && nTrue > 0)
    // the filter is actually selective, not saturated all-ones
    assert(nPass < row.getAs[Long]("n_probed"))
  }

  test("bfs hop layers are disjoint and edge-consistent") {
    val hops = Analytics.bfsHops(spark, sfDir).collect()
      .map(r => r.getAs[Long]("hop") -> r.getAs[Long]("n_nodes")).toMap
    // hop 0 = the seed set
    val e = Tables.events(spark, sfDir)
      .select(col("user_id").as("src"), (col("event_id") % 500).as("dst"))
      .distinct().persist()
    try {
      val seeds = e.filter(col("src") % 100 === 0)
        .select(col("src")).distinct().count()
      assert(hops(0L) == seeds)
      // layer sizes never exceed the whole (bounded) node universe and
      // each discovered node is counted exactly once across layers
      val universe = e.select(col("src").as("n"))
        .union(e.select(col("dst").as("n"))).distinct().count()
      assert(hops.values.sum <= universe)
    } finally e.unpersist()
  }

  test("retention baseline cell is exactly per-mille 1000") {
    val out = Analytics.retention(spark, sfDir)
    assert(out.count() > 0)
    assert(out.filter(col("weeks_since") === 0 && col("per_mille") =!= 1000)
      .count() == 0)
    // no cell retains more users than its cohort had at week 0
    assert(out.filter(col("per_mille") > 1000).count() == 0)
  }

  test("constraint audit reports all four checks over the clean corpus") {
    val rows = Analytics.constraints(spark, sfDir).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations"))
      .toMap
    assert(rows.keySet == Set("orderkey_unique", "custkey_not_null",
      "totalprice_positive", "orders_fk_customer"))
    // the synthetic corpus is clean — a nonzero count here means the
    // check itself is buggy, not the data
    assert(rows.values.forall(_ == 0L), s"unexpected violations: $rows")
  }

  test("salted aggregation equals the direct aggregation") {
    val salted = Analytics.saltedAgg(spark, sfDir)
    val direct = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(Qdsl.dec(col("value"))).cast("double").as("sum_value"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("merge upsert applies deletes, updates and inserts exactly once") {
    val base = Tables.documents(spark, sfDir)
    val nBase = base.count()
    val nDel = base.filter(col("doc_id") % 13 === 0).count()
    val nIns = base.filter(col("doc_id") % 11 === 0).count()
    val out = Analytics.mergeUpsert(spark, sfDir)
    val nMerged = out.agg(sum(col("n_docs"))).head().getLong(0)
    assert(nMerged == nBase - nDel + nIns)
    // updates shift sum_chars by exactly +1000 per updated row (+7 per
    // insert), never touching the delete/keep rows
    val nUpd = base.filter(col("doc_id") % 13 =!= 0 && col("doc_id") % 7 === 0).count()
    val charsBase = base.filter(col("doc_id") % 13 =!= 0)
      .agg(sum(col("n_chars"))).head().getLong(0)
    val charsIns = base.filter(col("doc_id") % 11 === 0)
      .agg(sum(col("n_chars") + 7)).head().getLong(0)
    val charsMerged = out.agg(sum(col("sum_chars"))).head().getLong(0)
    assert(charsMerged == charsBase + 1000L * nUpd + charsIns)
  }

  test("z-order buckets bound BOTH dimensions to one 256-wide tile") {
    val out = graft.queries.SortOps.zorderLayout(spark, sfDir).persist()
    try {
      assert(out.count() > 1, "need multiple tiles to demonstrate locality")
      assert(out.filter(col("x_max") - col("x_min") > 255).count() == 0)
      assert(out.filter(col("y_max") - col("y_min") > 255).count() == 0)
    } finally out.unpersist()
  }

  test("partitioned write round-trips the partition column exactly") {
    val out = Ingest.partitionedWrite(spark, sfDir)
    val direct = Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(Qdsl.hashMod(concat_ws("|", col("doc_id"), col("source"))))
          .as("row_checksum"))
    val j = out.select(col("lang"), col("n_docs"), col("row_checksum"))
    assert(j.exceptAll(direct).isEmpty && direct.exceptAll(j).isEmpty)
  }

  test("csv and jsonl round-trips preserve every row bit-exactly") {
    // the queries checksum the re-read rows; recompute the same census
    // straight from parquet and compare — codec drift breaks equality
    val viaCsv = Ingest.csvRoundtrip(spark, sfDir).head()
    val direct = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        Qdsl.dec(col("o_totalprice")).as("p"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        sum(Qdsl.hashMod(concat_ws("|", col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("p"), col("d"), col("o_orderpriority"))))
          .as("row_checksum")).head()
    assert(viaCsv.getAs[Long]("n_rows") == direct.getAs[Long]("n_rows"))
    assert(viaCsv.getAs[Long]("row_checksum") == direct.getAs[Long]("row_checksum"))

    val viaJson = Ingest.jsonlParse(spark, sfDir)
      .agg(sum(col("text_checksum"))).head().getLong(0)
    val directJson = Tables.documents(spark, sfDir)
      .agg(sum(Qdsl.hashMod(col("text")))).head().getLong(0)
    assert(viaJson == directJson)
  }

  test("winsorize: clip mass bounded by the 5% rank bands") {
    val rows = graft.queries.Analytics.winsorize(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, lo, hi, loV, hiV) =>
      val band = (n + 19) / 20
      // strictly-below-lo rows rank before the lo order statistic; ties
      // at the bound are kept — so each side clips at most ceil(n/20)
      assert(lo <= band, s"$t: clipped $lo below, band $band")
      assert(hi <= band, s"$t: clipped $hi above, band $band")
      assert(loV <= hiV, s"$t: lo bound $loV above hi bound $hiV")
    }
  }

  test("compaction plan: bins cover all bytes within the next-fit bound") {
    val segs = graft.core.Tables.documents(spark, sfDir)
      .groupBy(expr("doc_id DIV 20").as("segment"))
      .agg(sum(col("n_chars")).as("bytes"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = segs.values.sum
    val target = math.ceil(total / 8.0).toLong
    val bins = graft.queries.Ingest.compactionPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every segment lands in exactly one bin, bytes conserved
    assert(bins.map(_._2).sum == segs.size)
    assert(bins.map(_._3).sum == total)
    // the next-fit overshoot law: a bin exceeds the target only because
    // its LAST segment crossed the line, so no bin outgrows
    // target + max segment — the bound a rewrite job sizes memory by
    val maxSeg = segs.values.max
    bins.foreach { case (bin, _, bytes) =>
      assert(bytes < target + maxSeg, s"bin $bin holds $bytes > bound")
    }
    assert(bins.length > 1, "the plan must actually split the table")
  }

  test("key-skew census: ranked Zipf head with lawful salt factors") {
    val rows = graft.queries.Analytics.keySkew(spark, sfDir).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 10L), "contiguous ranks")
    assert(rows.sliding(2).forall(p => p(0)._3 >= p(1)._3),
      "counts non-increasing down the ranking")
    // token frequencies are Zipf: the head key must weigh MORE than the
    // uniform per-key load, i.e. need salting; and a salt factor can
    // never fall below 1 (every key weighs at least one shard)
    assert(rows.head._5 > 1L,
      s"head key ${rows.head} should exceed the uniform load")
    assert(rows.forall(_._5 >= 1L))
    assert(rows.forall(r => r._4 >= 0L && r._4 <= 1000L), "shares are per-mille")
    // the plan takes the top-10 without a global sort of the key census
    val plan = graft.queries.Analytics.keySkew(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Ingest

/** The bucketed-layout contract behind q_bucketed_join: writing both fact
  * sides `bucketBy(n, key)` + `sortBy(key)` (one file per bucket) buys a
  * join with NO exchange and NO sort — the co-location a 100 TB warehouse
  * pays for once at layout time instead of on every query. A plan
  * regression here (an Exchange creeping back in) is a scale bug even
  * while results stay correct.
  */
class BucketedJoinSpec extends SparkSpec {

  private lazy val joined = Ingest.bucketedJoinFrames(spark, sfDir,
    graft.core.Scratch.dir("bktli_spec", sfDir),
    graft.core.Scratch.dir("bktord_spec", sfDir), numBuckets = 4)

  test("bucketed join is SortMergeJoin with zero Exchange") {
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    assert(!p.contains("Exchange"),
      s"co-located join must not shuffle either side:\n$p")
    // the remaining sorts must be partition-local (global=false) — Spark
    // keeps them even over sortBy'd buckets unless the legacy
    // bucketedTableScan.outputOrdering flag is on, but they never shuffle
    assert(!p.linesIterator.exists(l =>
        l.contains("Sort [") && l.contains("], true,")),
      s"no global sort may appear:\n$p")
    assert(p.contains("Bucketed: true"), s"scan must be bucketed:\n$p")
  }

  test("bucketed join rows match the plain (shuffled) join") {
    val plain = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq
    val bucketed = joined
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq
    assert(bucketed == plain)
  }

  test("a bucket-key equality filter prunes to a single bucket") {
    val key = Tables.lineitem(spark, sfDir)
      .agg(min(col("l_orderkey"))).head().getLong(0)
    val p = joined.filter(col("l_orderkey") === key)
      .queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount: 1 out of 4"),
      s"expected single-bucket scan:\n$p")
  }

  test("groupBy on the bucket key aggregates with zero Exchange") {
    val li = graft.api.Layout.bucketize(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_quantity")),
      "l_orderkey", 4,
      graft.core.Scratch.dir("bktagg", sfDir), "graft_bkt_agg_spec")
    val p = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"))
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Exchange"),
      s"bucket layout must satisfy the aggregation distribution:\n$p")
  }

  test("merge-upsert against a bucketed base shuffles only the delta side") {
    val base = graft.api.Layout.bucketize(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("lang"), col("n_chars")),
      "doc_id", 4,
      graft.core.Scratch.dir("bktbase", sfDir), "graft_bkt_base_spec")
    val changes = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), (col("n_chars") + 1000).as("new_chars"))
    val merged = base.hint("merge")
      .join(changes, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), coalesce(col("new_chars"), col("n_chars")))
    val p = merged.queryExecution.executedPlan.toString
    val exchanges =
      p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"exactly the delta side may shuffle (found $exchanges):\n$p")
    // the bucketed base's scan subtree must reach the join unexchanged
    assert(p.contains("Bucketed: true"), p)
  }

  test("q_merge_upsert_bucketed's merge leg: one delta-side Exchange, unexchanged base") {
    // the REGISTERED query's own join leg (not a spec re-derivation):
    // the full CDC change batch (delete/update/insert union) may
    // shuffle once; the bucketed base must reach the full-outer
    // SortMergeJoin straight from its layout
    val merged = graft.queries.Analytics.mergeUpsertBucketedFrames(
      spark, sfDir, graft.core.Scratch.dir("bktdocs_spec", sfDir),
      numBuckets = 4)
    val p = merged.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"),
      s"expected full-outer SMJ:\n$p")
    val exchanges =
      p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"exactly the delta side may shuffle (found $exchanges):\n$p")
    assert(p.contains("Bucketed: true"), s"base scan must be bucketed:\n$p")
    // value identity with the plain merge: same census as mergeUpsert
    val census = merged
      .groupBy(col("mlang"))
      .agg(count(lit(1)).as("n"), sum(col("mchars")).as("c"))
      .orderBy(col("mlang")).collect().toSeq
    val plain = graft.queries.Analytics.mergeUpsert(spark, sfDir)
      .select(col("lang").as("mlang"), col("n_docs").as("n"),
        col("sum_chars").as("c"))
      .orderBy(col("mlang")).collect().toSeq
    assert(census.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ==
      plain.map(r => (r.getString(0), r.getLong(1), r.getLong(2))),
      "bucketed merge census drifted from the plain merge")
  }

  test("layout lands exactly one file per bucket per table") {
    val liPath = graft.core.Scratch.dir("bktli_files", sfDir)
    val ordPath = graft.core.Scratch.dir("bktord_files", sfDir)
    Ingest.bucketedJoinFrames(spark, sfDir, liPath, ordPath, numBuckets = 4)
    for (path <- Seq(liPath, ordPath)) {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-"))
      assert(files.length == 4,
        s"$path: expected 4 bucket files, got ${files.length}")
    }
  }
}

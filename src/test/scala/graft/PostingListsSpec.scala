package graft

import org.apache.spark.sql.functions._

import graft.queries.ThemisOps

/** The reference's exact InvertedIndexReduce output shape
  * (`InvertedIndexReduceFunction.cc:6-45`): one record per word carrying
  * the full posting list. The driver-checked query serializes the array
  * (pandas can't hash list cells); this spec covers the true array form.
  */
class PostingListsSpec extends SparkSpec {

  test("array form: postings sorted, distinct, df == length") {
    val rows = ThemisOps.postingListArrays(spark, sfDir)
      .select(col("word"), col("postings"), col("df")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getSeq[Long](1)
      assert(p == p.sorted, s"postings not sorted for ${r.getString(0)}")
      assert(p.distinct.size == p.size, s"dup posting for ${r.getString(0)}")
      assert(r.getLong(2) == p.size, s"df != |postings| for ${r.getString(0)}")
    }
  }

  test("string form is the canonical rendering of the array form") {
    val arr = ThemisOps.postingListArrays(spark, sfDir)
      .select(col("word"), concat_ws(",", col("postings")).as("p"))
    val str = ThemisOps.postingLists(spark, sfDir)
      .select(col("word"), col("postings").as("p"))
    assert(arr.except(str).isEmpty && str.except(arr).isEmpty)
  }

  test("one word's postings match a brute-force recount") {
    val word = ThemisOps.postingListArrays(spark, sfDir)
      .orderBy(col("df").desc, col("word")).select(col("word"))
      .first().getString(0)
    val expected = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(graft.queries.Qdsl.words(col("text"))).as("w"))
      .filter(col("w") === word).select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = ThemisOps.postingListArrays(spark, sfDir)
      .filter(col("word") === word).select(col("postings"))
      .first().getSeq[Long](0)
    assert(got == expected)
  }

  test("segment merge equals the one-shot index row for row") {
    // disjoint ordered id ranges make the merge a sorted-run concat — the
    // result must be EXACTLY the index built in one pass, string form and
    // df included (the oracle proves the same law against DuckDB)
    val merged = ThemisOps.postingsMerge(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val oneShot = ThemisOps.postingLists(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(merged == oneShot,
      s"merged segments drifted from the one-shot build")
    assert(merged.nonEmpty)
  }
}

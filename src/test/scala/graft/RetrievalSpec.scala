package graft

import org.apache.spark.sql.functions._

import graft.queries.{Retrieval, Similarity}

/** BM25 ranking laws and SemDeDup census invariants. */
class RetrievalSpec extends SparkSpec {

  test("bm25 emits 3 ranked docs per query term with descending scores") {
    val out = Retrieval.bm25TopK(spark, sfDir).persist()
    try {
      val terms = out.select(col("term")).distinct().count()
      assert(terms == 5)
      assert(out.count() == terms * 3)
      assert(out.filter(col("score") <= 0).count() == 0)
      // rank order == score order within each term (ties broken by doc_id
      // can only appear as equal scores, which still satisfy >=)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("term")).orderBy(col("rank"))
      val withPrev = out.withColumn("prev", lag(col("score"), 1).over(w))
      assert(withPrev.filter(col("prev").isNotNull &&
        col("prev") < col("score")).count() == 0,
        "a lower rank carried a lower score")
    } finally out.unpersist()
  }

  test("semdedup census partitions the vector set and bounds drops") {
    val out = Similarity.semDedup(spark, sfDir).persist()
    try {
      val total = graft.core.Tables.embeddings(spark, sfDir).count()
      // at most k = ceil(sqrt(n)) trained cells (the in-plan k contract)
      assert(out.count() <= math.ceil(math.sqrt(total.toDouble)).toLong)
      val sums = out.agg(sum(col("n_vectors")).as("nv"),
        sum(col("n_dropped")).as("nd")).collect().head
      assert(sums.getAs[Long]("nv") == total,
        "cells do not partition the vector set")
      assert(out.filter(col("n_dropped") > col("n_vectors")).count() == 0)
      // a dropped set implies a nonzero id checksum and vice versa
      assert(out.filter(col("n_dropped") === 0 &&
        col("dropped_id_sum") =!= 0).count() == 0)
    } finally out.unpersist()
  }
}

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

  test("hybrid RRF fuses both towers and ranks by the fused score") {
    val out = Retrieval.hybridRrf(spark, sfDir).persist()
    try {
      // 20 query docs × top 3 fused candidates
      assert(out.select(col("q_id")).distinct().count() == 20)
      assert(out.count() == 60)
      // rank order == fused-score order within each query
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("rank"))
      val withPrev = out.withColumn("prev", lag(col("rrf"), 1).over(w))
      assert(withPrev.filter(col("prev").isNotNull &&
        col("prev") < col("rrf")).count() == 0,
        "a lower rank carried a lower fused score")
      // every fused score is positive and no candidate claims more
      // towers than exist
      assert(out.filter(col("rrf") <= 0).count() == 0)
      assert(out.filter(col("n_towers") < 1 || col("n_towers") > 2).count() == 0)
      // a two-tower candidate at the same ranks beats one-tower: the
      // max possible one-tower score is 1/61, the min two-tower score
      // is 1/70 + 1/65 > 1/61 at the list depths used here
      val twoTower = out.filter(col("n_towers") === 2)
      if (twoTower.count() > 0) {
        val minTwo = twoTower.agg(min(col("rrf"))).head().getDouble(0)
        assert(minTwo > 1.0 / 70.0, s"two-tower scores must stack: $minTwo")
      }
    } finally out.unpersist()
  }

  test("pruned lexical tower equals the exact intersect tower rank-for-rank") {
    val exact = Retrieval.lexRanksExact(spark, sfDir)
    val pruned = Retrieval.lexRanksPruned(spark, sfDir)
    assert(exact.exceptAll(pruned).count() == 0 &&
      pruned.exceptAll(exact).count() == 0,
      "inverted-index candidate generation changed the lexical ranking")
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

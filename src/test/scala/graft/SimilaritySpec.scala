package graft

import graft.queries.Similarity

/** Invariants for the embedding similarity operators at sf0.001. */
class SimilaritySpec extends SparkSpec {

  test("brute kNN: 5 contiguous ranks per query, no self-matches") {
    val rows = Similarity.knnBrute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      assert(rs.forall(_._3 != q), "no self neighbor")
    }
  }

  test("ANN results are a subset of each query's bucket and never self") {
    val rows = Similarity.annLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).distinct.length === rs.length, "ranks unique per query")
      assert(rs.forall(_._3 != q))
    }
  }

  test("lshWeight stays in [-1000, 1000] and is deterministic") {
    val w1 = for (b <- 0 until 6; d <- 1 to 64) yield Similarity.lshWeight(b, d)
    val w2 = for (b <- 0 until 6; d <- 1 to 64) yield Similarity.lshWeight(b, d)
    assert(w1 === w2)
    assert(w1.forall(w => w >= -1000 && w <= 1000))
    assert(w1.distinct.length > 100, "weights should be well spread")
  }

  test("kmeans assignment covers every vector exactly once") {
    val rows = Similarity.kmeansAssign(spark, sfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    val n = graft.core.Tables.embeddings(spark, sfDir).count()
    assert(total === n)
  }
}

package graft

import graft.api.Vectors
import graft.queries.Similarity

/** NDCG rank-eval: the driver-rounded discount ladder must reproduce the
  * oracle-pinned k=3 constants (otherwise the facade drifts from the
  * oracle-checked query), and the scoring must order rankings the way
  * NDCG is supposed to — perfect > right-set-wrong-order > misses. */
class NdcgSpec extends SparkSpec {
  import spark.implicits._

  test("discount ladder reproduces the pinned oracle constants at k=3") {
    assert(Similarity.ndcgDiscLadder(3) === Seq(1000000L, 630930L, 500000L))
  }

  test("perfect ranking scores 1e6 ppm; swapped order scores less; misses least") {
    val truth = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L))
      .toDF("q_id", "rank", "neighbor_id")
    def score(rows: Seq[(Long, Long, Long)]): Long =
      Vectors.ndcgAtK(rows.toDF("q_id", "rank", "neighbor_id"), truth, k = 3)
        .collect().head.getLong(2)
    val perfect = score(Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L)))
    assert(perfect === 1000000L)
    // right neighbors, reversed order: recall@3 = 1.0 but NDCG sees it
    val reversed = score(Seq((1L, 1L, 12L), (1L, 2L, 11L), (1L, 3L, 10L)))
    assert(reversed < perfect && reversed > 0L)
    // one hit, two misses
    val misses = score(Seq((1L, 1L, 10L), (1L, 2L, 99L), (1L, 3L, 98L)))
    assert(misses < reversed)
  }

  test("facade at k=3 equals the oracle-checked query on the testdata") {
    val q = Similarity.ndcgEval(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // rebuild through the public facade from the same legs
    val got = Vectors.ndcgAtK(
      graft.SparkEntry.queries("q_ann_ivf")(spark, sfDir),
      graft.SparkEntry.queries("q_knn_brute")(spark, sfDir), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === q)
  }
}

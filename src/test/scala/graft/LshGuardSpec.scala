package graft

import org.apache.spark.sql.functions._

import graft.queries.{Similarity, TextPipeline}

/** Hot-bucket guards: an adversarial corpus that collapses into one LSH
  * bucket must not re-create the O(n²) pair join the bucketing exists to
  * prevent. The guard drops over-cap buckets before any self-join; benign
  * corpora (bucket sizes under the cap) are untouched.
  */
class LshGuardSpec extends SparkSpec {
  import spark.implicits._

  private val nDocs = 50

  private def identicalCorpus = {
    (0L until nDocs.toLong)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
  }

  test("minhash guard drops the degenerate all-identical bucket") {
    val pairs = TextPipeline.dedupMinhashDocs(identicalCorpus, cap = 16)
    assert(pairs.count() == 0,
      "an all-identical corpus must produce no pair-join work under the cap")
  }

  test("minhash guard is inert when buckets fit the cap") {
    val pairs = TextPipeline.dedupMinhashDocs(identicalCorpus, cap = nDocs)
    // every pair collides in all 4 bands with a full 8/8 signature match
    assert(pairs.count() == nDocs.toLong * (nDocs - 1) / 2)
    assert(pairs.filter(col("n_match") =!= 8).count() == 0)
  }

  test("ann guard drops the degenerate all-identical bucket") {
    val all = (0L until 60L)
      .map(i => (i, "x", Seq.fill(64)(1000L)))
      .toDF("vec_id", "label", "v")
      .withColumn("n2", lit(64L * 1000 * 1000))
    assert(Similarity.annLshVecs(all, cap = 16).count() == 0)
    // under a permissive cap the same corpus yields top-3 per query
    assert(Similarity.annLshVecs(all, cap = 512).count() == 20 * 3)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.queries.TextPipeline

/** Invariant checks for the dedup/text-analysis operators at sf0.001. */
class TextPipelineSpec extends SparkSpec {

  test("minhash: candidate pairs have valid ids and agreement in [0, 8]") {
    val rows = TextPipeline.dedupMinhash(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered a < b")
      val m = r.getLong(2)
      assert(m >= 0 && m <= 8)
    }
    // every bucket-collision pair shares at least one full band (2 hashes)
    assert(rows.forall(_.getLong(2) >= 2),
      "a shared band implies >= 2 matching minhashes")
  }

  test("simhash: one fingerprint per document, within 32 bits") {
    val df = TextPipeline.dedupSimhash(spark, sfDir)
    val n = df.count()
    val docs = graft.core.Tables.documents(spark, sfDir).count()
    assert(n === docs)
    assert(df.filter(col("simhash") < 0 || col("simhash") >= (1L << 32)).count() === 0)
  }

  test("jaccard near-dups are bounded by 1 and symmetric-free") {
    val rows = TextPipeline.jaccardNeardup(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(4)
      assert(j >= 0.8 && j <= 1.0)
      assert(r.getLong(2) <= r.getLong(3), "intersection <= union")
    }
  }

  test("fingerprint is deterministic across runs") {
    val a = TextPipeline.fingerprint(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = TextPipeline.fingerprint(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
    assert(a.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("text quality ratios are consistent") {
    TextPipeline.textQuality(spark, sfDir).collect().foreach { r =>
      val nTokens = r.getLong(2); val nDistinct = r.getLong(3); val nStop = r.getLong(4)
      assert(nDistinct <= nTokens)
      assert(nStop <= nTokens)
      assert(r.getDouble(5) > 0 && r.getDouble(5) <= 1.0)
    }
  }
}

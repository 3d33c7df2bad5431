package graft

import org.apache.spark.sql.functions._

import graft.queries.TextPipeline
import graft.queries.Qdsl.words

/** Chunk-level dedup census and per-group deterministic sampling. */
class ChunkSampleSpec extends SparkSpec {

  test("chunk dedup census accounts for every chunk exactly once") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    // total chunks = Σ ceil(n_tokens/10) (empty docs would still emit one
    // empty chunk — the corpus has none, asserted here so the invariant
    // below stays exact)
    val totalChunks = docs
      .select(words(col("text")).as("ws"))
      .select(expr("(size(ws) - 1) DIV 10 + 1").as("k"))
      .agg(sum(col("k"))).head().getLong(0)
    val out = TextPipeline.chunkDedup(spark, sfDir).persist()
    try {
      val accounted = out.agg(sum(col("cnt") * col("n_chunks"))).head().getLong(0)
      assert(accounted == totalChunks,
        s"census covers $accounted of $totalChunks chunks")
      // duplicated chunks exist in the corpus (documents share phrases),
      // so the census must have a cnt > 1 row — guards against a dedup
      // that never actually groups
      assert(out.filter(col("cnt") > 1).count() > 0)
    } finally out.unpersist()
  }

  test("per-group sample is exactly the hash-min-k set, sizes capped") {
    val out = TextPipeline.sampleGroup(spark, sfDir).persist()
    try {
      val sizes = out.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      assert(sizes.filter(col("n") > 10).count() == 0)
      // recompute one stratum by brute force: the 10 smallest (u, doc_id)
      val docs = graft.core.Tables.documents(spark, sfDir)
        .select(col("lang"), col("doc_id"),
          graft.queries.Qdsl.hashMod(col("doc_id")).as("u"))
      val lang = docs.select(col("lang")).head().getString(0)
      val expected = docs.filter(col("lang") === lang)
        .orderBy(col("u"), col("doc_id")).limit(10)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      val got = out.filter(col("lang") === lang)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(got == expected)
    } finally out.unpersist()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.api.Corpus
import graft.queries.Cdc

/** Contracts for content-defined chunking: the chunks PARTITION the token
  * stream exactly, and boundaries re-align after an edit (the property
  * fixed-offset chunking lacks and the whole reason CDC exists). */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  // deterministic ~240-token text with enough hash variety to cut often
  private def tokensFrom(seed: Long, n: Int): Seq[String] =
    (1 to n).map(i => s"t${(i * i * 2654435761L + seed) % 97}")

  test("chunks partition each document: lengths sum to the token count") {
    val rows = Cdc
      .cdcCensus(spark, sfDir)
      .agg(sum("sum_chunk_tok").as("chunk_toks")).collect()(0).getLong(0)
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(sum(size(Corpus.tokenize(col("text"))))).collect()(0).getLong(0)
    assert(rows == toks, s"chunk tokens $rows != corpus tokens $toks")
  }

  test("shift robustness: a prefix edit preserves most downstream chunk hashes") {
    val base = tokensFrom(7, 240).mkString(" ")
    val shifted = "inserted noise prefix xyz " + base
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val chunks = Corpus.cdcChunks(docs).collect()
    val a = chunks.filter(_.getLong(0) == 1L).map(_.getLong(2)).toSet
    val b = chunks.filter(_.getLong(0) == 2L).map(_.getLong(2)).toSet
    assert(a.size >= 3, s"base doc should cut into several chunks, got ${a.size}")
    val shared = (a intersect b).size
    assert(shared * 2 >= a.size,
      s"expected most of the ${a.size} base chunks to survive the prefix edit, shared only $shared")
    // the control: FIXED 64-token chunking shares nothing after the edit
    val fixedShared = {
      docs.select(col("doc_id"), Corpus.tokenize(col("text")).as("ws"))
        .select(col("doc_id"),
          explode(expr("transform(sequence(0, (size(ws) - 1) div 64), " +
            "i -> concat_ws(' ', slice(ws, i * 64 + 1, 64)))")).as("chunk"))
        .groupBy(col("chunk")).agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") === 2).count()
    }
    assert(fixedShared == 0,
      s"control broken: fixed chunking shared $fixedShared chunks across the edit")
  }

  test("facade accepts arbitrary column names and emits one row per chunk") {
    val docs = Seq((10L, tokensFrom(3, 100).mkString(" ")))
      .toDF("my_id", "body")
    val out = Corpus.cdcChunks(docs, id = "my_id", text = "body")
    assert(out.columns.toSeq == Seq("my_id", "clen", "chash"))
    val lens = out.select(sum("clen")).collect()(0).getLong(0)
    assert(lens == 100L, s"facade chunk lengths sum to $lens, want 100")
  }

  test("short documents (< one window) are a single whole-doc chunk") {
    val docs = Seq((1L, "just five little tokens here")).toDF("doc_id", "text")
    val out = Corpus.cdcChunks(docs).collect()
    assert(out.length == 1 && out(0).getLong(1) == 5L)
  }
}

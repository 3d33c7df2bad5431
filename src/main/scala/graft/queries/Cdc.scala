package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GQuery, Tables}
import Qdsl._

/** Content-defined chunking (CDC): chunk boundaries chosen by the CONTENT
  * (a rolling-window hash hitting a mask), not by fixed offsets — the
  * shift-robust complement of q_chunk_dedup's fixed 64-token blocks. An
  * insertion near the start of a document moves every fixed-chunk
  * boundary after it (so fixed chunking re-hashes the whole tail as
  * "new"), but CDC boundaries downstream of the edit re-align after one
  * window length, so the tail's chunks keep their hashes — the property
  * rsync/LBFS/FastCDC-style dedup systems are built on, and what a
  * recrawl-heavy corpus needs so yesterday's near-identical page doesn't
  * re-enter the index as all-new chunks.
  *
  * Semantics: over the token stream `w[1..n]` (engine tokenizer), every
  * 8-token window `w[i..i+7]` whose content hash ≡ 0 (mod 16) CUTS after
  * its last token (position i+7). Cut positions strictly increase with i,
  * so the chunks partition the tokens exactly (Σ chunk lengths = n); a
  * final cut at position n is dropped rather than manufacturing an empty
  * tail chunk. Docs shorter than one window are a single chunk. Expected
  * chunk length ≈ 16 grams; the mask is the chunk-size dial (FastCDC's
  * normalization level).
  *
  * Scale shape: windows, cuts and chunk hashes are ALL scan-local array
  * expressions (one projection, zero data-sized shuffles before the
  * census); the per-source census exchanges (source, 8-byte hash) rows ∝
  * chunks, never chunk text. The distinct-chunk census is the dedup
  * payoff measure: n_chunks − n_distinct_chunks is exactly the mass a
  * CDC-keyed store would skip writing.
  */
object Cdc {

  /** Exploded chunk rows (doc_id, source, clen, chash) for a
    * (doc_id, source, text) projection — shared by the oracle-checked
    * census and the `Corpus.cdcChunks` facade. */
  private[graft] def chunkRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"), words(col("text")).as("w"))
      .withColumn("n", size(col("w")))
      // cut after token t (8 <= t < n) iff the window ending at t hashes
      // to the mask; sequence() only under n >= 8 (it DESCENDS when
      // start > stop — the spanWindows lesson)
      .withColumn("cuts",
        when(col("n") >= 8, expr(
          "filter(sequence(8, n), t -> t < n AND " +
            "graft_hash60(concat_ws(' ', slice(w, t - 7, 8))) % 16 = 0)"))
          .otherwise(expr("array()")))
      .withColumn("j", explode(expr("sequence(1, size(cuts) + 1)")))
      .withColumn("st",
        when(col("j") === 1, lit(1))
          .otherwise(expr("element_at(cuts, j - 1) + 1")))
      .withColumn("en",
        when(col("j") === expr("size(cuts) + 1"), col("n"))
          .otherwise(expr("element_at(cuts, j)")))
      .select(col("doc_id"), col("source"),
        (col("en") - col("st") + 1).cast("long").as("clen"),
        hash60(concat_ws(" ", expr("slice(w, st, en - st + 1)"))).as("chash"))

  /** Per-source CDC census over the documents table: chunk counts,
    * distinct-chunk counts (the dedup win), the largest chunk, the
    * token-conservation total (Σ clen = Σ doc tokens — the partition
    * invariant, oracle-checked), and an order-free hash checksum pinning
    * chunk CONTENT, not just counts. */
  def cdcCensus(s: SparkSession, dir: String): DataFrame =
    chunkRows(Tables.documentsWide(s, dir).select("doc_id", "source", "text"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        countDistinct(col("chash")).as("n_distinct_chunks"),
        max(col("clen")).as("max_chunk_tok"),
        sum(col("clen")).as("sum_chunk_tok"),
        sum(col("chash") % P).as("hash_checksum"))

  // oracle cap: range(1, 1025) covers cut lists up to 1024 entries and
  // the j-explosion up to 1024 chunks/doc (current corpus max ~110
  // tokens/doc → ≤ 13 windows/doc; ≥8× headroom per the SURVEY §9 cap
  // convention — grow with the corpus)
  private val cdcCensusSql =
    s"""WITH t AS (
      |  SELECT doc_id, source, $wordsSqlDoc AS ws FROM documents),
      |s AS (SELECT doc_id, source, ws, len(ws) AS n FROM t),
      |cu AS (
      |  SELECT doc_id, source, ws, n,
      |    CASE WHEN n >= 8 THEN
      |      list_filter(list_transform(range(1, greatest(n - 6, 1)), i -> i + 7),
      |        t -> t < n AND CAST('0x' || substring(md5(array_to_string(ws[t-7:t], ' ')),1,15) AS BIGINT) % 16 = 0)
      |    ELSE [] END AS cuts
      |  FROM s),
      |c AS (
      |  SELECT doc_id, source, ws, n, cuts, j.j AS j
      |  FROM cu CROSS JOIN range(1, 1025) j(j)
      |  WHERE j <= len(cuts) + 1),
      |ch AS (
      |  SELECT doc_id, source, ws,
      |    CASE WHEN j = 1 THEN 1 ELSE cuts[j-1] + 1 END AS st,
      |    CASE WHEN j = len(cuts) + 1 THEN n ELSE cuts[j] END AS en
      |  FROM c),
      |h AS (
      |  SELECT doc_id, source, CAST(en - st + 1 AS BIGINT) AS clen,
      |    CAST('0x' || substring(md5(array_to_string(ws[st:en], ' ')),1,15) AS BIGINT) AS chash
      |  FROM ch)
      |SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_chunks,
      |  COUNT(DISTINCT chash) AS n_distinct_chunks,
      |  CAST(MAX(clen) AS BIGINT) AS max_chunk_tok,
      |  CAST(SUM(clen) AS BIGINT) AS sum_chunk_tok,
      |  CAST(SUM(chash % 1000000007) AS BIGINT) AS hash_checksum
      |FROM h GROUP BY source""".stripMargin

  val defs: Seq[GQuery] = Seq(
    GQuery("q_cdc_chunks", cdcCensus, Some(cdcCensusSql), headline = true))
}

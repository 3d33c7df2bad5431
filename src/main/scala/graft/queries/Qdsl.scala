package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared column helpers for oracle-checked queries.
  *
  * Oracle determinism strategy (see core/GQuery.scala): all monetary inputs
  * are 2-decimal doubles, so we cast to DECIMAL(12,2) before arithmetic.
  * Decimal math is exact and engine-independent; the final CAST to DOUBLE
  * rounds the same exact decimal on both engines (IEEE round-half-even),
  * giving bit-identical doubles for the driver's hash compare.
  *
  * Precision budget: (12,2)*(12,2) -> (25,4); cast to (14,4) then *(12,2)
  * -> (27,6); SUM adds 10 digits of headroom -> still < 38 on both Spark
  * and DuckDB, so no engine ever overflows or silently rescales.
  */
object Qdsl {
  /** Exact 2-decimal view of a monetary double column. */
  def dec(c: Column): Column = c.cast("decimal(12,2)")
  def dec(name: String): Column = dec(col(name))

  /** one minus a 2-decimal column, still exact decimal. */
  def oneMinus(c: Column): Column = lit(1).cast("decimal(12,2)") - dec(c)
  def onePlus(c: Column): Column = lit(1).cast("decimal(12,2)") + dec(c)

  /** ep * (1 - disc) as exact decimal, re-tightened for further products. */
  def discPrice(ep: Column, disc: Column): Column =
    (dec(ep) * oneMinus(disc)).cast("decimal(14,4)")

  /** Exact decimal sum surfaced as a bit-stable double. */
  def sumDec(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average: exact-decimal sum divided by count, both
    * engines perform the identical double division. */
  def avgDec(c: Column): Column =
    sum(dec(c)).cast("double") / count(c).cast("double")

  /** Epoch milliseconds of a timestamp column. Testdata parquet loads as
    * TIMESTAMP_NTZ in Spark 4; the session runs in UTC, so casting through
    * LTZ yields the same instant DuckDB's `epoch_ms` computes. */
  def epochMs(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** Split free text into non-empty tokens on the reference tokenizer's
    * delimiter class — space plus `".,/()?;` (WordTokenizer.cc:27-70).
    * Implemented as translate(delims → space) + literal-space split, which
    * is semantically identical to splitting on the character class but
    * ~2× faster in the hot shingle paths (a regex split benches the
    * text-heavy queries at double the wall time; translate is a single
    * codegen'd char-map pass). Empties from repeated delimiters are
    * filtered.
    *
    * The reference additionally breaks a word on the literal two-byte
    * sequence `\`+`n`, with the `n` starting the NEXT word
    * (WordTokenizer.cc:35-39: the `\` is the stop character and scanning
    * resumes at the `n`) — replicated by rewriting that sequence to
    * " n" before the char-map pass. A lone `\` not followed by `n` stays
    * inside its word, exactly as in the reference. Mirrored exactly by
    * [[wordsSqlDoc]]. */
  def words(c: Column): Column =
    graft.functions.GraftTokenize(c.cast("string"))

  /** The composition [[words]] replaced (kept for the parity fuzz in
    * TokenizerFidelitySpec — the DuckDB mirror still spells it): a regex
    * pass + two full string copies + split + filter per row, vs the
    * kernel's single byte walk. */
  private[graft] def wordsComposition(c: Column): Column =
    filter(split(translate(regexp_replace(c, "\\\\n", " n"),
      "\".,/()?;", "        "), " "), w => w =!= "")

  /** DuckDB mirror of [[words]] applied to a column named `text`. */
  val wordsSqlDoc: String =
    """list_filter(string_split(translate(regexp_replace(text, '\\n', ' n', 'g'), '".,/()?;', '        '), ' '), w -> w != '')"""

  /** Portable 60-bit hash: first 15 hex chars of md5, parsed base-16.
    * DuckDB mirror: CAST('0x' || substring(md5(s),1,15) AS BIGINT).
    * 60 bits keeps the value positive and leaves headroom for modular
    * arithmetic (a*h+b with a,b < 1e9 under BIGINT).
    *
    * Computed by the fused native expression
    * [[graft.functions.GraftHash60]] (bit-identical to the
    * conv∘substring∘md5 composition, skips the hex-string round-trip —
    * this is the hottest scalar in the dedup/sampling paths; equality
    * with the composition is spec-pinned in Hash60Spec). */
  def hash60(c: Column): Column = graft.functions.GraftHash60(c.cast("string"))

  /** The same hash reduced mod p (p = 1e9+7) for affine re-hashing. */
  val P: Long = 1000000007L
  def hashMod(c: Column): Column = hash60(c) % P

  /** BM25 score with k1 = 1.2 and b = 0.75 as exact rationals: idf scaled
    * 1e6 as an exact integer ratio, the length-normalized denominator
    * cleared of fractions by multiplying through with 20·L, and ONE
    * final double ratio with pinned operand order — bit-identical across
    * engines. Shared by the oracle-checked q_bm25_topk and the
    * `Corpus.bm25` facade so the two can never drift. Columns: term
    * frequency, document frequency, doc length, doc count, total tokens. */
  def bm25Score(tf: Column, df: Column, dl: Column,
      nd: Column, ltot: Column): Column = {
    val idf6 = call_function("div", ((nd - df) * 2 + 1) * 1000000L, df * 2 + 1)
    idf6.cast("double") * (tf * 22).cast("double") * (ltot * 2).cast("double") /
      (tf * ltot * 20 + ltot * 6 + dl * nd * 18).cast("double")
  }

  /** Hashed-feature linear logit of a token array:
    * Σ (hash60(token) % 2001 − 1000) — the fastText-style classifier
    * score with deterministic hash-derived bucket weights. ONE definition
    * shared by the oracle-checked q_quality_classifier and
    * `Corpus.classifierLogit`, so the facade and the gate can never
    * drift; a production model swaps exactly this expression for its
    * trained weights. */
  def hashedLogit(tokens: Column): Column =
    aggregate(transform(tokens, t => hash60(t) % 2001L - 1000L),
      lit(0L), (a, x) => a + x)

  /** Loud-failure guard for the DuckDB oracle's static `range(N)`
    * fan-out caps (SURVEY §9): DuckDB's range() cannot take subqueries,
    * so each oracle enumerates at most N items per row while the Spark
    * side enumerates unbounded — a corpus grown past a cap would
    * SILENTLY hash-diverge the gate. Wrapping the enumerated array makes
    * a breach a NAMED in-plan error on exactly the offending row, with
    * the fix spelled out. Pure scalar projection: no new exchange, the
    * golden plan censuses are unchanged. */
  def oracleCapped(arr: Column, cap: Int, site: String): Column =
    // NULL arrays pass through untouched (size(NULL) is NULL, which would
    // route to the raise_error branch): explode(NULL) yields zero rows,
    // exactly the pre-guard behavior for a null text/content row
    when(arr.isNull || size(arr) <= lit(cap), arr)
      .otherwise(raise_error(format_string(
        s"oracle fan-out cap breached [$site]: %d enumerated items > $cap " +
          "— grow the DuckDB range(N) cap and this guard together (SURVEY §9)",
        size(arr))))

  /** [[oracleCapped]] for code paths SHARED between a registered oracle
    * query and a library facade: the query passes `Some(cap)` (its DuckDB
    * mirror enumerates `range(cap)` so a breach must fail loudly), the
    * facade passes `None` (it has no oracle and must accept arbitrary
    * frames — the r11 lesson: a cap leaked into `Corpus.dedupRewrite`
    * regressed every >1024-chunk document). */
  def oracleCapped(arr: Column, cap: Option[Int], site: String): Column =
    cap match {
      case Some(c) => oracleCapped(arr, c, site)
      case None => arr
    }

  /** All space-joined 8-grams of a token-array column (caller filters
    * size ≥ 8). ONE definition shared by decontamination and the curate
    * funnel — the gram construction is load-bearing for oracle parity
    * (DuckDB mirror: `array_to_string(ws[j : j+7], ' ')` over
    * `range(4096)`; see SURVEY's fan-out-cap note), so it must not fork.
    * Cap-guarded: the oracle's range(4096) yields starts 1..4095, so a
    * document with more than 4095 grams fails loudly here. */
  def grams8(tokenCol: String): Column =
    oracleCapped(
      expr(s"transform(sequence(1, size($tokenCol) - 7), " +
        s"i -> concat_ws(' ', slice($tokenCol, i, 8)))"),
      4095, s"8-grams($tokenCol)")
}

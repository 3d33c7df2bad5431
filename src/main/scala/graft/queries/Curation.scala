package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{GQuery, Tables}
import Qdsl._

/** Round-9 curation depth: the pipeline stages that REWRITE or RE-WEIGHT
  * the corpus rather than merely censusing it — C4-style dedup with
  * document reconstruction, CCNet perplexity bucketing, DSIR importance
  * re-weighting, and Johnson-Lindenstrauss sign projection of the
  * embedding table. All integer-exact for the DuckDB oracle gate.
  *
  * Reference anchor: these extend the reference's map/reduce text stack
  * (WordCount/NGram/InvertedIndex, mapreduce/functions/map/) in the
  * direction BASELINE.md's north star calls for — a training-data
  * pipeline over the same corpus tables.
  */
object Curation {

  private def docWords: Column = words(col("text"))

  // ------------------------------------------- C4-style dedup rewrite

  /** Keep-first chunk dedup WITH document reconstruction — the write-out
    * form of [[TextPipeline.chunkDedup]]'s census (C4 / Dolma drop
    * duplicate spans and keep the rewritten documents, not just counts).
    * Every 10-token chunk keeps only its globally-first occurrence
    * (ordered by doc_id, then position); each document is reassembled
    * from its surviving chunks in original order and censused per
    * language: surviving docs, kept/dropped chunks, rebuilt-text
    * checksum, tokens retained.
    *
    * Scale shape: chunks are built scan-locally; the keep-first decision
    * is one hash agg on chunk content + an equi-join back (AQE-broadcast
    * when the distinct-chunk side is small, shuffle-hash otherwise); the
    * rebuild groups each doc's own chunks — one doc-keyed exchange whose
    * payload is exactly the surviving text. Nothing is ever compared
    * all-pairs, and no driver-side state exists. The 1024 position cap
    * mirrors chunkDedup's (tripwired by OracleCapSpec's doc-length
    * bound). */
  def dedupRewrite(s: SparkSession, dir: String): DataFrame = {
    val chunks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), docWords.as("ws"))
      .select(col("doc_id"), col("lang"),
        posexplode(transform(sequence(lit(0), expr("(size(ws) - 1) DIV 10")),
          i => array_join(slice(col("ws"), i * 10 + 1, lit(10)), " "))))
      .select(col("doc_id"), col("lang"), col("pos"), col("col").as("chunk"))
    val firstOcc = chunks.groupBy(col("chunk"))
      .agg(min(col("doc_id") * 1024 + col("pos")).as("first_occ"))
    val kept = chunks.join(firstOcc, "chunk")
      .filter(col("doc_id") * 1024 + col("pos") === col("first_occ"))
    val rebuilt = kept.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_kept"),
        sum(size(split(col("chunk"), " "))).as("toks"),
        // pos is unique per doc -> the struct sort is total; chunks
        // reassemble in original document order
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
          x => x.getField("chunk")), " ").as("clean_text"))
    val tot = chunks.groupBy(col("lang")).agg(count(lit(1)).as("n_chunks"))
    rebuilt.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_kept")).as("n_chunks_kept"),
        sum(hashMod(col("clean_text"))).as("text_checksum"),
        sum(col("toks")).as("tokens_kept"))
      .join(tot, "lang")
      .select(col("lang"), col("n_docs_kept"), col("n_chunks_kept"),
        (col("n_chunks") - col("n_chunks_kept")).as("n_chunks_dropped"),
        col("text_checksum"), col("tokens_kept"))
  }

  private val dedupRewriteSql =
    s"""WITH w AS (
      |  SELECT doc_id, lang, $wordsSqlDoc AS ws FROM documents),
      |c AS (
      |  SELECT doc_id, lang, j.j AS pos,
      |    array_to_string(ws[j.j*10+1 : j.j*10+10], ' ') AS chunk
      |  FROM w CROSS JOIN range(1024) j(j)
      |  WHERE j.j <= (len(ws) - 1) // 10),
      |f AS (SELECT chunk, MIN(doc_id*1024 + pos) AS first_occ FROM c GROUP BY chunk),
      |k AS (
      |  SELECT c.doc_id, c.lang, c.pos, c.chunk
      |  FROM c JOIN f USING (chunk)
      |  WHERE c.doc_id*1024 + c.pos = f.first_occ),
      |r AS (
      |  SELECT doc_id, lang, COUNT(*) AS n_kept,
      |    SUM(len(string_split(chunk, ' '))) AS toks,
      |    string_agg(chunk, ' ' ORDER BY pos) AS clean_text
      |  FROM k GROUP BY doc_id, lang),
      |tot AS (SELECT lang, COUNT(*) AS n_chunks FROM c GROUP BY lang)
      |SELECT r.lang AS lang, COUNT(*) AS n_docs_kept,
      |  CAST(SUM(n_kept) AS BIGINT) AS n_chunks_kept,
      |  CAST(MAX(tot.n_chunks) - SUM(n_kept) AS BIGINT) AS n_chunks_dropped,
      |  CAST(SUM(CAST('0x' || substring(md5(clean_text),1,15) AS BIGINT) % 1000000007) AS BIGINT) AS text_checksum,
      |  CAST(SUM(toks) AS BIGINT) AS tokens_kept
      |FROM r JOIN tot ON r.lang = tot.lang
      |GROUP BY r.lang""".stripMargin

  // ------------------------------------------- CCNet perplexity buckets

  /** CCNet-style head/middle/tail bucketing: documents ranked by their
    * unigram-LM score (the [[TextPipeline.unigramLm]] signal — high
    * score = common words = low perplexity) and cut into exact global
    * terciles; bucket 2 is the "head" (most fluent third), 0 the "tail".
    * Census per (lang, bucket).
    *
    * The global rank is computed WITHOUT a global sort: scores are
    * decomposed into coarse bands (score DIV 2000 — monotone in score,
    * so band boundaries respect the order); band counts prefix-sum on a
    * bands-sized frame, and a per-band window assigns within-band
    * row numbers. rank = bands-before + within-band row number, exactly
    * the single-partition ROW_NUMBER the oracle runs, at
    * shuffle-parallel cost. This is the same two-phase-cumsum trick as
    * q_token_budget (Mixing.scala). */
  def ccnetBuckets(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), explode(docWords).as("w"))
    val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .crossJoin(toks.agg(count(lit(1)).as("tot")))
      .select(col("w"), expr("(1000000 * n) DIV tot").as("score"))
    val ds = toks.join(counts, "w")
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("SUM(score) DIV COUNT(*)").as("doc_score"))
    val banded = ds.withColumn("band", expr("doc_score DIV 2000"))
    val bandOffsets = banded.groupBy(col("band"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("cum_before",
        coalesce(sum(col("bn")).over(
          Window.orderBy(col("band")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("band"), col("cum_before"))
    val rn = banded.withColumn("rn",
      row_number().over(Window.partitionBy(col("band"))
        .orderBy(col("doc_score"), col("doc_id"))))
    rn.join(bandOffsets, "band")
      .crossJoin(ds.agg(count(lit(1)).as("n_total")))
      .withColumn("bucket", expr("(3 * (cum_before + rn - 1)) DIV n_total"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_score")).as("score_sum"),
        min(col("doc_id")).as("min_doc"))
  }

  private val ccnetBucketsSql =
    s"""WITH toks AS (
      |  SELECT doc_id, lang, unnest($wordsSqlDoc) AS w FROM documents),
      |c AS (
      |  SELECT w, (1000000 * COUNT(*)) // (SELECT COUNT(*) FROM toks) AS score
      |  FROM toks GROUP BY w),
      |d AS (
      |  SELECT t.doc_id, t.lang, SUM(c.score) // COUNT(*) AS doc_score
      |  FROM toks t JOIN c ON c.w = t.w
      |  GROUP BY t.doc_id, t.lang),
      |r AS (
      |  SELECT doc_id, lang, doc_score,
      |    ROW_NUMBER() OVER (ORDER BY doc_score, doc_id) AS rnk,
      |    COUNT(*) OVER () AS n_total
      |  FROM d)
      |SELECT lang, CAST((3 * (rnk - 1)) // n_total AS BIGINT) AS bucket,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(doc_score) AS BIGINT) AS score_sum,
      |  MIN(doc_id) AS min_doc
      |FROM r GROUP BY 1, 2""".stripMargin

  // ------------------------------------------- DSIR importance weights

  /** DSIR-style importance re-weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * documents are scored by how target-like their hashed n-gram
    * features are. Features are bigrams hashed into 1024 buckets; the
    * target distribution is the English slice, the source is the whole
    * corpus; each bucket carries the Laplace-smoothed scaled ratio
    * (10⁶·(target+1)) DIV (source+1) — the integer-exact stand-in for
    * the paper's log-likelihood ratio (monotone in the same direction;
    * a trained variant swaps the bucket table). Documents average their
    * buckets' ratios; census per (lang, weight band).
    *
    * Scale shape: the feature table is 1024 rows regardless of corpus
    * size — it always broadcasts; bigram features are built scan-locally
    * and only (doc_id, bucket) pairs shuffle to the two count aggs and
    * the per-doc average. Identical plan skeleton to the CCNet unigram
    * scorer but with a bounded-width model table. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), docWords.as("w"))
      .filter(size(col("w")) >= 2)
    val fx = d.select(col("doc_id"), col("lang"),
        explode(expr("transform(sequence(1, size(w) - 1), " +
          "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))")).as("b"))
      .select(col("doc_id"), col("lang"), (hash60(col("b")) % 1024L).as("f"))
    val tgt = fx.filter(col("lang") === "en")
      .groupBy(col("f")).agg(count(lit(1)).as("tn"))
    val src = fx.groupBy(col("f")).agg(count(lit(1)).as("sn"))
    val ratio = src.join(tgt, Seq("f"), "left")
      .select(col("f"),
        expr("(1000000 * (coalesce(tn, 0) + 1)) DIV (sn + 1)").as("r"))
    fx.join(ratio, "f")
      .groupBy(col("doc_id"), col("lang"))
      .agg(expr("SUM(r) DIV COUNT(*)").as("weight"))
      .groupBy(col("lang"), expr("weight DIV 20000").as("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("weight")).as("weight_sum"),
        min(col("doc_id")).as("min_doc"))
  }

  private val dsirWeightsSql =
    s"""WITH d AS (
      |  SELECT doc_id, lang, $wordsSqlDoc AS w FROM documents),
      |bg AS (
      |  SELECT doc_id, lang,
      |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS b
      |  FROM d WHERE len(w) >= 2),
      |fx AS (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substring(md5(b),1,15) AS BIGINT) % 1024 AS f
      |  FROM bg),
      |tgt AS (SELECT f, COUNT(*) AS tn FROM fx WHERE lang = 'en' GROUP BY f),
      |src AS (SELECT f, COUNT(*) AS sn FROM fx GROUP BY f),
      |ratio AS (
      |  SELECT src.f, (1000000 * (COALESCE(tn, 0) + 1)) // (sn + 1) AS r
      |  FROM src LEFT JOIN tgt ON src.f = tgt.f),
      |dw AS (
      |  SELECT doc_id, lang, SUM(r) // COUNT(*) AS weight
      |  FROM fx JOIN ratio USING (f) GROUP BY doc_id, lang)
      |SELECT lang, CAST(weight // 20000 AS BIGINT) AS band,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(weight) AS BIGINT) AS weight_sum,
      |  MIN(doc_id) AS min_doc
      |FROM dw GROUP BY 1, 2""".stripMargin

  // ------------------------------------------- random sign projection

  /** The (j,i) entry of the fixed ±1 projection matrix, derived from the
    * portable 60-bit hash so the oracle re-derives the identical matrix
    * from md5 — no weights ship out-of-band. */
  private def signOf(j: Int, i: Int): Long =
    if (graft.functions.GraftHash60.hash(s"${j}_${i}".getBytes("UTF-8")) % 2 == 0) 1L
    else -1L

  private lazy val signRows: Seq[Seq[Long]] =
    Seq.tabulate(16)(j => Seq.tabulate(64)(i => signOf(j, i)))

  /** Johnson-Lindenstrauss sign projection of the embedding table:
    * 64 dims → 16 via a fixed ±1 matrix (Achlioptas, "Database-friendly
    * random projections"), the dimensionality-reduction front end an ANN
    * index runs before bucketing. Embeddings are milli-scaled to exact
    * integers (the [[Similarity]] determinism strategy), so every
    * projected coordinate is an exact BIGINT dot product. Census per
    * label: projection checksum and the JL quality dial — per-row
    * ‰-ratio of mean projected energy Σp²/16 to original energy Σv²,
    * which concentrates near 1000 when the projection preserves norms.
    *
    * Scale shape: entirely scan-local arithmetic (the matrix is a
    * 16×64 literal folded into codegen); the only exchange is the
    * labels-sized census agg. At 100 TB this is the map-side step feeding
    * the LSH/IVF index builds, with zero added shuffle. */
  def embedProject(s: SparkSession, dir: String): DataFrame = {
    val iv = expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
    val proj = transform(typedLit(signRows), row =>
      aggregate(zip_with(row, col("v"), (a, b) => a * b), lit(0L), (acc, x) => acc + x))
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), iv.as("v"))
      .select(col("vec_id"), col("label"), col("v"), proj.as("p"))
      .select(col("vec_id"), col("label"),
        aggregate(transform(col("p"), x => x % P), lit(0L), (a, b) => a + b).as("pchk"),
        aggregate(transform(col("p"), x => x * x), lit(0L), (a, b) => a + b).as("psq"),
        aggregate(transform(col("v"), x => x * x), lit(0L), (a, b) => a + b).as("e2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("pchk")).as("proj_checksum"),
        sum(when(col("e2") > 0, expr("(1000 * psq) DIV (16 * e2)"))).as("ratio_pm_sum"),
        min(col("vec_id")).as("min_vec"))
  }

  private val embedProjectSql =
    """WITH e AS (
      |  SELECT vec_id, label,
      |    [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS v
      |  FROM embeddings),
      |p AS (
      |  SELECT vec_id, label, v,
      |    [list_reduce(list_prepend(CAST(0 AS BIGINT),
      |       list_transform(range(0, 64), i ->
      |         (CASE WHEN CAST('0x' || substring(md5(j || '_' || i),1,15) AS BIGINT) % 2 = 0
      |          THEN 1 ELSE -1 END) * v[i+1])),
      |       (a, b) -> a + b)
      |     for j in range(0, 16)] AS pr
      |  FROM e),
      |q AS (
      |  SELECT vec_id, label,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(pr, x -> x % 1000000007)), (a, b) -> a + b) AS pchk,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(pr, x -> x * x)), (a, b) -> a + b) AS psq,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(v, x -> x * x)), (a, b) -> a + b) AS e2
      |  FROM p)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(pchk) AS BIGINT) AS proj_checksum,
      |  CAST(SUM(CASE WHEN e2 > 0 THEN (1000 * psq) // (16 * e2) END) AS BIGINT) AS ratio_pm_sum,
      |  MIN(vec_id) AS min_vec
      |FROM q GROUP BY label""".stripMargin

  val defs: Seq[GQuery] = Seq(
    GQuery("q_dedup_rewrite", dedupRewrite, Some(dedupRewriteSql), headline = true),
    GQuery("q_ccnet_buckets", ccnetBuckets, Some(ccnetBucketsSql)),
    GQuery("q_dsir_weights", dsirWeights, Some(dsirWeightsSql)),
    GQuery("q_embed_project", embedProject, Some(embedProjectSql)))
}

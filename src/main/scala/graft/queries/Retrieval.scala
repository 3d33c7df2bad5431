package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Caches, GQuery, Tables}
import graft.core.Caches.TrackedOps
import Qdsl._

/** Full-text retrieval scoring over the `documents` corpus — the search
  * side of a data platform (quality-filtering pipelines also use BM25
  * against seed queries to mine domain-relevant documents, the
  * "importance sampling" recipe from the GPT-3/PaLM data papers).
  */
object Retrieval {

  /** BM25 top-3 documents for each of the 5 highest-document-frequency
    * terms of length ≥ 5 (a deterministic, data-derived query workload).
    * k1 = 1.2 and b = 0.75 enter as exact rationals; the per-(term, doc)
    * score is assembled from integer corpus statistics
    * (idf scaled 1e6 as an exact integer ratio, the length-normalized
    * denominator cleared of fractions by multiplying through with 20·L)
    * and only the final ratio is evaluated in double precision, with a
    * pinned operand order — so both engines produce bit-identical scores
    * and the ranking is fully deterministic (ties break on doc_id).
    *
    * Scale shape: one tokenize scan builds (doc, term, tf) — persisted,
    * since document frequency, document length, and scoring all read it;
    * corpus stats join in as a 1-row aggregate (never a driver-side
    * count); the query-term table is top-k + broadcast, so scoring
    * touches ONLY the 5 terms' postings (an equi-join prunes the
    * vocabulary before any math); ranking is a per-term window over ≤
    * df rows. Nothing in the plan grows with vocabulary except the df
    * aggregation itself.
    *
    * Overflow note: the denominator term 20·L·tf stays under 2^63 for
    * corpora to ~10¹³ tokens with tf ≤ 10⁴; past that, divide L and dl
    * by a common 2^k first (the ratio dl/avgdl is what matters). */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documentsWide(s, dir)
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .trackedPersist()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("ltot"))
    val qterms = dfreq.filter(length(col("term")) >= 5)
      .orderBy(col("df").desc, col("term")).limit(5)
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(qterms), "term")
      .join(dl, "doc_id")
      .crossJoin(stats)
      .select(col("term"), col("doc_id"),
        bm25Score(col("tf"), col("df"), col("dl"), col("nd"), col("ltot"))
          .as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("term"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score"))
  }

  private val bm25TopKSql =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest($wordsSqlDoc) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
      |stats AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS ltot FROM dl),
      |qterms AS (SELECT term, df FROM dfreq WHERE length(term) >= 5
      |           ORDER BY df DESC, term LIMIT 5),
      |scored AS (
      |  SELECT t.term, t.doc_id,
      |    CAST(((s.nd - q.df) * 2 + 1) * 1000000 // (q.df * 2 + 1) AS DOUBLE)
      |      * CAST(t.tf * 22 AS DOUBLE)
      |      * CAST(s.ltot * 2 AS DOUBLE)
      |      / CAST(t.tf * s.ltot * 20 + s.ltot * 6 + d.dl * s.nd * 18 AS DOUBLE)
      |      AS score
      |  FROM tf t JOIN qterms q USING (term)
      |  JOIN dl d USING (doc_id) CROSS JOIN stats s)
      |SELECT term, CAST(rank AS BIGINT) AS rank, doc_id, score FROM (
      |  SELECT term, doc_id, score,
      |    row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rank
      |  FROM scored) t WHERE rank <= 3""".stripMargin

  // --------------------------------------------- hybrid retrieval (RRF)

  /** Reciprocal-rank-fusion constant: the standard k = 60 from Cormack &
    * Clarke's RRF paper — large enough that rank-1 vs rank-2 differences
    * don't dominate, small enough that tail ranks still contribute. */
  private val RrfK = 60L

  /** Lexical rank-list depth shared by both hybrid forms. */
  private val TopLex = 10L

  /** EXACT lexical tower: distinct-token overlap of every document vs
    * the broadcast query set, scored with `array_intersect` inside one
    * corpus scan — the per-query rank window reads its query's full
    * candidate set (the knnBrute-style baseline shape). */
  private[graft] def lexRanksExact(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), array_distinct(words(col("text"))).as("w"))
    val qt = toks.filter(col("doc_id") < 20)
      .select(col("doc_id").as("q_id"), col("w").as("qw"))
    val wLex = Window.partitionBy(col("q_id"))
      .orderBy(col("overlap").desc, col("doc_id"))
    toks.join(broadcast(qt), col("doc_id") =!= col("q_id"))
      .select(col("q_id"), col("doc_id"),
        size(array_intersect(col("w"), col("qw"))).cast("long").as("overlap"))
      .filter(col("overlap") >= 1)
      .withColumn("lrank", row_number().over(wLex).cast("long"))
      .filter(col("lrank") <= TopLex)
      .select(col("q_id"), col("doc_id"), col("lrank"))
  }

  /** PRUNED lexical tower: candidates surface through the inverted-index
    * (doc, term) ⋈ broadcast query-term join, so only documents sharing
    * ≥ 1 token with a query are ever touched and the group-by count IS
    * |A∩B| on distinct token sets — rank-for-rank identical output to
    * [[lexRanksExact]] (spec-pinned in RetrievalSpec) at postings cost. */
  private[graft] def lexRanksPruned(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(words(col("text")))).as("term"))
    val qt = toks.filter(col("doc_id") < 20)
      .select(col("doc_id").as("q_id"), col("term"))
    val wLex = Window.partitionBy(col("q_id"))
      .orderBy(col("overlap").desc, col("doc_id"))
    toks.join(broadcast(qt), "term")
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("lrank", row_number().over(wLex).cast("long"))
      .filter(col("lrank") <= TopLex)
      .select(col("q_id"), col("doc_id"), col("lrank"))
  }

  /** Hybrid retrieval by RECIPROCAL RANK FUSION — the modern two-tower
    * retrieval recipe (lexical + dense, fused without score calibration)
    * that curation pipelines run for retrieval-based decontamination and
    * domain mining. For each of the 20 query documents: a LEXICAL
    * ranking (distinct-token overlap vs every other document — the
    * exact-term leg) and a SEMANTIC ranking (the oracle-checked
    * brute-cosine top-5 over the embedded subset, doc_id ≡ vec_id in
    * the testdata) are fused as Σ 1/(k + rank) and the top 3 fused
    * candidates emitted. Ranks are integers, each fused score is a sum
    * of at MOST TWO correctly-rounded divisions (order-free: a+b is
    * exact-commutative), so the fusion is bit-deterministic on both
    * engines with ties broken on doc_id.
    *
    * Scale shape: both legs are query-set-broadcast one-pass scans (the
    * knnBrute shape); the fusion joins two ≤(queries × top-k) rank lists
    * — metadata-sized at any corpus size — with a full-outer join so a
    * candidate surfaced by only one tower still scores. Like knnBrute,
    * the towers HERE are the exact baselines (each per-query rank
    * window reads its query's full candidate set); at 100 TB the same
    * fusion runs over the engine's pruned towers instead — q_bm25_topk
    * (postings pruned before scoring) and q_ann_ivf (cell-local
    * candidates) plug into [[graft.api.Corpus.rrfFuse]] unchanged,
    * since RRF only consumes rank lists. */
  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    val lex = lexRanksExact(s, dir)
    val sem = Similarity.knnBrute(s, dir)
      .select(col("q_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("srank"))
    val wFuse = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        (coalesce(lit(1.0) / (col("lrank") + RrfK).cast("double"), lit(0.0)) +
          coalesce(lit(1.0) / (col("srank") + RrfK).cast("double"), lit(0.0)))
          .as("rrf"),
        (col("lrank").isNotNull.cast("long") +
          col("srank").isNotNull.cast("long")).as("n_towers"))
      .withColumn("rank", row_number().over(wFuse).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("doc_id"), col("rrf"),
        col("n_towers"))
  }

  private val hybridRrfSql =
    s"""WITH toks AS (
      |  SELECT doc_id, list_distinct($wordsSqlDoc) AS w FROM documents),
      |qt AS (SELECT doc_id AS q_id, w AS qw FROM toks WHERE doc_id < 20),
      |lexall AS (
      |  SELECT q.q_id, t.doc_id,
      |    CAST(len(list_intersect(t.w, q.qw)) AS BIGINT) AS overlap
      |  FROM toks t CROSS JOIN qt q WHERE t.doc_id <> q.q_id),
      |lex AS (
      |  SELECT q_id, doc_id, lrank FROM (
      |    SELECT q_id, doc_id,
      |      CAST(row_number() OVER (PARTITION BY q_id ORDER BY overlap DESC, doc_id) AS BIGINT) AS lrank
      |    FROM lexall WHERE overlap >= 1) t WHERE lrank <= 10),
      |sem AS (
      |  SELECT q_id, neighbor_id AS doc_id, rank AS srank
      |  FROM (${Similarity.knnBruteSql})),
      |fused AS (
      |  SELECT COALESCE(l.q_id, s.q_id) AS q_id,
      |    COALESCE(l.doc_id, s.doc_id) AS doc_id,
      |    COALESCE(CAST(1 AS DOUBLE) / CAST(l.lrank + $RrfK AS DOUBLE), CAST(0 AS DOUBLE))
      |      + COALESCE(CAST(1 AS DOUBLE) / CAST(s.srank + $RrfK AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf,
      |    CAST(CASE WHEN l.lrank IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN s.srank IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_towers
      |  FROM lex l FULL OUTER JOIN sem s
      |    ON l.q_id = s.q_id AND l.doc_id = s.doc_id)
      |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf, n_towers FROM (
      |  SELECT q_id, doc_id, rrf, n_towers,
      |    row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rank
      |  FROM fused) t WHERE rank <= 3""".stripMargin

  /** [[hybridRrf]] with BOTH towers on their 100 TB scale paths — the
    * production form of the fusion. The lexical tower generates
    * candidates through an INVERTED-INDEX join instead of scanning every
    * document per query: corpus (doc, term) postings equi-join the
    * broadcast query-term list, so only documents sharing ≥ 1 token with
    * a query ever surface, and the per-candidate overlap count falls out
    * of the join group-by — work ∝ Σ postings(query tokens), pruned by
    * vocabulary exactly like BM25 scoring. (On distinct token sets the
    * join count IS |A∩B|, so the ranking law matches the exact tower.)
    * The dense tower is the 2-probe IVF search (cell-local candidates,
    * q_ann_ivf) instead of the brute scan. Fusion is unchanged — RRF
    * only consumes rank lists. */
  def hybridPruned(s: SparkSession, dir: String): DataFrame = {
    val lex = lexRanksPruned(s, dir)
    val sem = Similarity.annIvf(s, dir)
      .select(col("q_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("srank"))
    val wFuse = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        (coalesce(lit(1.0) / (col("lrank") + RrfK).cast("double"), lit(0.0)) +
          coalesce(lit(1.0) / (col("srank") + RrfK).cast("double"), lit(0.0)))
          .as("rrf"),
        (col("lrank").isNotNull.cast("long") +
          col("srank").isNotNull.cast("long")).as("n_towers"))
      .withColumn("rank", row_number().over(wFuse).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("doc_id"), col("rrf"),
        col("n_towers"))
  }

  private val hybridPrunedSql =
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(list_distinct($wordsSqlDoc)) AS term FROM documents),
      |qt AS (SELECT doc_id AS q_id, term FROM toks WHERE doc_id < 20),
      |cand AS (
      |  SELECT q.q_id, t.doc_id, CAST(COUNT(*) AS BIGINT) AS overlap
      |  FROM toks t JOIN qt q USING (term) WHERE t.doc_id <> q.q_id
      |  GROUP BY 1, 2),
      |lex AS (
      |  SELECT q_id, doc_id, lrank FROM (
      |    SELECT q_id, doc_id,
      |      CAST(row_number() OVER (PARTITION BY q_id ORDER BY overlap DESC, doc_id) AS BIGINT) AS lrank
      |    FROM cand) t WHERE lrank <= 10),
      |sem AS (
      |  SELECT q_id, neighbor_id AS doc_id, rank AS srank
      |  FROM (${Similarity.annIvfSql})),
      |fused AS (
      |  SELECT COALESCE(l.q_id, s.q_id) AS q_id,
      |    COALESCE(l.doc_id, s.doc_id) AS doc_id,
      |    COALESCE(CAST(1 AS DOUBLE) / CAST(l.lrank + $RrfK AS DOUBLE), CAST(0 AS DOUBLE))
      |      + COALESCE(CAST(1 AS DOUBLE) / CAST(s.srank + $RrfK AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf,
      |    CAST(CASE WHEN l.lrank IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN s.srank IS NULL THEN 0 ELSE 1 END AS BIGINT) AS n_towers
      |  FROM lex l FULL OUTER JOIN sem s
      |    ON l.q_id = s.q_id AND l.doc_id = s.doc_id)
      |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf, n_towers FROM (
      |  SELECT q_id, doc_id, rrf, n_towers,
      |    row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rank
      |  FROM fused) t WHERE rank <= 3""".stripMargin

  /** THREE-tower fusion through [[graft.api.Corpus.rrfFuse]] itself —
    * the n-list facade path under the oracle, not just spec cover. The
    * towers: exact lexical overlap, exact brute cosine, and the 2-probe
    * IVF search (a deliberately diverse panel — at 100 TB a fusion
    * stack routinely mixes an exact re-rank tower with approximate
    * candidate towers). Determinism with ≥ 3 lists is exactly what
    * rrfFuse's sorted-contribution fold exists for: both engines sum
    * the SAME doubles in the SAME (ascending) order from the same 0.0
    * accumulator, so the fused score is bit-identical; ties break on
    * doc_id. Scale shape: three metadata-sized rank lists union and
    * aggregate — corpus rows are only touched inside each tower. */
  def hybridRrf3(s: SparkSession, dir: String): DataFrame = {
    val lex = lexRanksExact(s, dir)
      .select(col("q_id"), col("doc_id"), col("lrank").as("rank"))
    val sem = Similarity.knnBrute(s, dir)
      .select(col("q_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val ivf = Similarity.annIvf(s, dir)
      .select(col("q_id"), col("neighbor_id").as("doc_id"), col("rank"))
    graft.api.Corpus.rrfFuse(Seq(lex, sem, ivf), query = "q_id",
      id = "doc_id", rank = "rank", k = RrfK.toInt, topK = 3)
  }

  private val hybridRrf3Sql =
    s"""WITH toks AS (
      |  SELECT doc_id, list_distinct($wordsSqlDoc) AS w FROM documents),
      |qt AS (SELECT doc_id AS q_id, w AS qw FROM toks WHERE doc_id < 20),
      |lexall AS (
      |  SELECT q.q_id, t.doc_id,
      |    CAST(len(list_intersect(t.w, q.qw)) AS BIGINT) AS overlap
      |  FROM toks t CROSS JOIN qt q WHERE t.doc_id <> q.q_id),
      |lex AS (
      |  SELECT q_id, doc_id, lrank FROM (
      |    SELECT q_id, doc_id,
      |      CAST(row_number() OVER (PARTITION BY q_id ORDER BY overlap DESC, doc_id) AS BIGINT) AS lrank
      |    FROM lexall WHERE overlap >= 1) t WHERE lrank <= 10),
      |sem AS (
      |  SELECT q_id, neighbor_id AS doc_id, rank AS srank
      |  FROM (${Similarity.knnBruteSql})),
      |ivf AS (
      |  SELECT q_id, neighbor_id AS doc_id, rank AS irank
      |  FROM (${Similarity.annIvfSql})),
      |contrib AS (
      |  SELECT q_id, doc_id,
      |    CAST(1 AS DOUBLE) / CAST(lrank + $RrfK AS DOUBLE) AS c FROM lex
      |  UNION ALL SELECT q_id, doc_id,
      |    CAST(1 AS DOUBLE) / CAST(srank + $RrfK AS DOUBLE) FROM sem
      |  UNION ALL SELECT q_id, doc_id,
      |    CAST(1 AS DOUBLE) / CAST(irank + $RrfK AS DOUBLE) FROM ivf),
      |fused AS (
      |  SELECT q_id, doc_id,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_sort(list(c))),
      |      (a, b) -> a + b) AS rrf,
      |    CAST(COUNT(*) AS BIGINT) AS n_lists
      |  FROM contrib GROUP BY q_id, doc_id)
      |SELECT q_id, CAST(rn AS BIGINT) AS fused_rank, doc_id, rrf, n_lists
      |FROM (
      |  SELECT q_id, doc_id, rrf, n_lists,
      |    row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rn
      |  FROM fused) t WHERE rn <= 3""".stripMargin

  val defs: Seq[GQuery] = Seq(
    GQuery("q_bm25_topk", bm25TopK, Some(bm25TopKSql), headline = true),
    GQuery("q_hybrid_rrf", hybridRrf, Some(hybridRrfSql)),
    GQuery("q_hybrid_rrf3", hybridRrf3, Some(hybridRrf3Sql)),
    GQuery("q_hybrid_pruned", hybridPruned, Some(hybridPrunedSql), headline = true))
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Caches, GQuery, Tables}
import Qdsl._

/** Corpus-mixture shaping: temperature-flattened language sampling and
  * token-budget-constrained selection — the two knobs a pretraining
  * recipe turns after cleaning (mT5/XLM-R-style α-sampling; "best docs
  * until the budget runs out" selection).
  */
object Mixing {

  /** Temperature-based mixture sampling (α = 0.5): each language's keep
    * rate is proportional to `count^α / count` — flattening the language
    * distribution so high-resource languages are down-sampled and
    * low-resource ones kept whole (the multilingual pretraining recipe
    * from the mT5/XLM-R papers). The α-power runs in double precision
    * with a pinned op sequence (sqrt of an integer count — bit-identical
    * on any IEEE engine), is floored onto a per-mille integer grid, and
    * the per-document draw is the engine's standard derandomized
    * hash-threshold. Census reports realized vs target mass per language.
    *
    * Scale shape: language counts are ONE tiny aggregation (∝ languages);
    * the rate table broadcasts back onto the scan (AQE picks broadcast
    * at any corpus size — it is languages-sized); the draw never
    * shuffles. Rates normalize so the smallest language is kept whole
    * (1000‰) and every larger one is flattened by sqrt(n_min/n_l). */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    // rate_l ∝ n_l^(α−1) = n_l^(−1/2), normalized so the SMALLEST language
    // is kept whole: rate_l = 1000·sqrt(n_min/n_l) — computed on the tiny
    // per-language count table
    val minN = counts.agg(min(col("n")).as("n_min"))
    val rates = counts.crossJoin(minN)
      .select(col("lang"), col("n"),
        least(lit(1000L),
          floor(sqrt(col("n_min").cast("double") / col("n").cast("double"))
            * 1000.0).cast("long")).as("rate_pm"))
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .join(rates, "lang")
      .select(col("lang"), col("n"), col("rate_pm"), col("doc_id"), col("n_chars"),
        (hashMod(col("doc_id")) % 1000).as("u"))
      .groupBy(col("lang"))
      .agg(max(col("n")).as("n_total"),
        max(col("rate_pm")).as("rate_pm"),
        sum(when(col("u") < col("rate_pm"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("u") < col("rate_pm"), col("n_chars"))).as("kept_chars"),
        sum(when(col("u") < col("rate_pm"), col("doc_id"))).as("kept_id_sum"))
  }

  private val temperatureMixSql =
    """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      |m AS (SELECT MIN(n) AS n_min FROM c),
      |r AS (SELECT lang, n,
      |        LEAST(1000, CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE))
      |          * 1000.0) AS BIGINT)) AS rate_pm
      |      FROM c CROSS JOIN m),
      |d AS (
      |  SELECT doc.lang, r.n, r.rate_pm, doc.doc_id, doc.n_chars,
      |    CAST('0x' || substring(md5(CAST(doc.doc_id AS VARCHAR)),1,15) AS BIGINT)
      |      % 1000000007 % 1000 AS u
      |  FROM documents doc JOIN r USING (lang))
      |SELECT lang, MAX(n) AS n_total, MAX(rate_pm) AS rate_pm,
      |  CAST(SUM(CASE WHEN u < rate_pm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN u < rate_pm THEN n_chars END) AS BIGINT) AS kept_chars,
      |  CAST(SUM(CASE WHEN u < rate_pm THEN doc_id END) AS BIGINT) AS kept_id_sum
      |FROM d GROUP BY lang""".stripMargin

  /** Token-budget-constrained selection: documents ranked corpus-wide by
    * a quality key (longest-first here; a real run plugs its quality
    * score in) are taken in order until a global 10k-token budget is
    * exhausted — "the best data that fits the budget", the data-selection
    * step of budgeted pretraining (e.g. the DoReMi / data-mixing
    * literature). The straddling document (the one that crosses the
    * budget line) is kept, so the budget is met-or-just-exceeded;
    * per-language census of the selection.
    *
    * Scale shape: the ranking is a RANGE-partitioned global sort (the
    * GraySort machinery — sampled boundaries, no single-reducer sort)
    * and the running total is one window cumsum over it; only (id,
    * n_tok, lang) triples ever sort — never document text. Construction
    * is job-free: the prefix offsets are an IN-PLAN window over the
    * #partitions-row per-partition totals, not a driver collect. */
  def tokenBudget(s: SparkSession, dir: String): DataFrame = {
    val Budget = 10000L
    // DISTRIBUTED global cumsum — an unpartitioned window would drag the
    // whole corpus onto one task. Phase 1: range-partition by the global
    // order (sampled boundaries — the GraySort machinery) so partition i
    // holds ranks strictly before partition i+1. Phase 2: per-partition
    // token totals become prefix offsets via an exclusive-prefix window
    // over the #partitions-row total table (single-task, but over ~32
    // rows of metadata — never corpus data) and broadcast back. Phase 3:
    // the cumsum window runs PER PARTITION, in parallel, offset by
    // phase 2. The result is a function of the global order alone, so
    // the sampled partition boundaries never affect the output.
    //
    // The cache below is what makes pid well-defined: both the offset
    // agg and the final join read the SAME materialized partitioning
    // (two independent executions of repartitionByRange could sample
    // different boundaries). First action materializes it; the harness
    // drains it via Caches.release().
    val ranked = Caches.tracked(Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tok"))
      .repartitionByRange(col("n_tok").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id()))
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offDf = ranked.groupBy(col("pid")).agg(sum(col("n_tok")).as("ptot"))
      .withColumn("offset", coalesce(sum(col("ptot")).over(wOff), lit(0L)))
      .select(col("pid"), col("offset"))
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("n_tok").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.join(broadcast(offDf), "pid")
      .withColumn("cum", col("offset") + sum(col("n_tok")).over(w))
      .filter(col("cum") - col("n_tok") < Budget) // straddler kept
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("n_tok")).as("min_tok"), sum(col("doc_id")).as("id_sum"))
  }

  private val tokenBudgetSql =
    s"""WITH t AS (
      |  SELECT lang, doc_id, CAST(len($wordsSqlDoc) AS BIGINT) AS n_tok
      |  FROM documents),
      |r AS (
      |  SELECT lang, doc_id, n_tok,
      |    SUM(n_tok) OVER (ORDER BY n_tok DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t)
      |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(MIN(n_tok) AS BIGINT) AS min_tok, CAST(SUM(doc_id) AS BIGINT) AS id_sum
      |FROM r WHERE cum - n_tok < 10000 GROUP BY lang""".stripMargin

  /** Deterministic training-shard export manifest: every document lands
    * in shard hash60(doc_id) % 64, is ordered within its shard by
    * (hash60(doc_id), doc_id) — a stable corpus-wide pseudo-random
    * permutation, the "global shuffle" a training run wants with zero
    * random state — and receives the exclusive cumulative token offset
    * where its tokens start in the shard file. The census pins docs,
    * token mass, AND the per-shard offset SUM: any different intra-shard
    * order changes that sum, so the manifest's byte layout is
    * oracle-pinned, not just its membership.
    *
    * Scale shape: ONE shuffle — the shard exchange the export itself
    * requires — and the offset prefix-sum window rides it
    * (partitionBy(shard) reuses the exchange, no second one). Only
    * (id, hash, n_tok) triples move; document text would flow straight
    * from scan to shard writer in the real export. 64 shards at equal
    * hash mass also demonstrates the skew posture: shard sizes
    * concentrate around n/64 regardless of any doc_id clustering. */
  def shardManifest(s: SparkSession, dir: String): DataFrame =
    shardManifestDocs(Tables.documents(s, dir))

  /** Per-document shard assignment + exclusive prefix-sum offsets over a
    * (doc_id, n_tok) frame: (doc_id, shard, n_tok, offset). ONE
    * definition shared by the oracle-checked [[shardManifest]] census and
    * the `Corpus.shardManifest` facade so the two can never drift. */
  private[graft] def shardOffsets(d0: DataFrame, nShards: Int): DataFrame = {
    val d = d0
      .select(col("doc_id"), hash60(col("doc_id")).as("h"), col("n_tok"))
      .select(col("doc_id"), (col("h") % nShards).as("shard"), col("h"),
        col("n_tok"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
  }

  private[graft] def shardManifestDocs(docs: DataFrame): DataFrame =
    shardOffsets(
      docs.select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tok")), 64)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("offset")).as("offset_sum"))

  private val shardManifestSql =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) AS h,
      |    CAST(len($wordsSqlDoc) AS BIGINT) AS n_tok
      |  FROM documents),
      |o AS (
      |  SELECT h % 64 AS shard, n_tok,
      |    COALESCE(SUM(n_tok) OVER (PARTITION BY h % 64 ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS "offset"
      |  FROM t)
      |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(SUM("offset") AS BIGINT) AS offset_sum
      |FROM o GROUP BY shard""".stripMargin

  /** Sample size for [[prioritySample]] — needs corpus > SampleK+1 docs
    * (the smallest testdata slice has 500). */
  val SampleK = 64

  /** Priority sampling (Duffield–Lund–Thorup, JACM 2007): a weight-aware
    * sample of exactly k documents WITHOUT replacement, with the unbiased
    * subset-sum estimator audited against the exact total. Each doc gets
    * priority w/u (u a derandomized per-doc uniform from the engine's
    * standard hash draw); the top-k by priority are the sample, the
    * (k+1)-th priority is the threshold τ, and Σ max(w, τ) over the
    * sample estimates Σw — the fixed-size counterpart of the Bernoulli
    * sampler (q_sample_weighted), the shape a token-budgeted corpus
    * draw wants when the output size must be exact.
    *
    * Determinism: priority = (w·P)/u1 is ONE double division of exact
    * integers (w·P < 2^53); the estimator splits into an integer sum
    * (heavy docs, w > τ) plus τ·count(light) — one multiply + one add,
    * never an order-dependent double accumulation.
    *
    * Scale shape: the top-(k+1) is a TakeOrderedAndProject (per-partition
    * k+1 heap + (k+1)-row merge — no global sort at any corpus size);
    * everything after operates on k+1 rows of metadata. The census
    * crossJoins are 1-row broadcasts. */
  def prioritySample(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").as("wt"),
        (hashMod(col("doc_id")) + 1).as("u1"))
      .select(col("doc_id"), col("wt"),
        (col("wt").cast("double") * lit(P) / col("u1")).as("priority"))
    val top = d.orderBy(col("priority").desc, col("doc_id")).limit(SampleK + 1)
      .select(col("doc_id"), col("wt"), col("priority"),
        row_number().over(Window.orderBy(col("priority").desc, col("doc_id")))
          .as("rn"))
    val tau = top.filter(col("rn") === SampleK + 1)
      .select(col("priority").as("tau"))
    val totals = d.agg(sum(col("wt")).as("true_total"),
      count(lit(1)).as("n_docs"))
    top.filter(col("rn") <= SampleK)
      .crossJoin(broadcast(tau))
      .agg(count(lit(1)).as("n_sample"),
        min(col("tau")).as("tau"),
        sum(col("doc_id")).as("sample_id_sum"),
        sum(col("wt")).as("sample_wt_sum"),
        sum(when(col("wt").cast("double") > col("tau"), col("wt"))
          .otherwise(0L)).as("sum_heavy"),
        sum(when(col("wt").cast("double") > col("tau"), 0L)
          .otherwise(1L)).as("n_light"))
      .crossJoin(broadcast(totals))
      .select(col("n_sample"), col("tau"), col("sample_id_sum"),
        col("sample_wt_sum"), col("sum_heavy"), col("n_light"),
        (col("sum_heavy").cast("double") +
          col("tau") * col("n_light").cast("double")).as("est_total"),
        col("true_total"), col("n_docs"))
  }

  private val prioritySampleSql =
    """WITH d AS (
      |  SELECT doc_id, n_chars AS wt,
      |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT)
      |      % 1000000007 + 1 AS u1
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, wt, CAST(wt AS DOUBLE) * 1000000007 / u1 AS priority
      |  FROM d),
      |r AS (
      |  SELECT doc_id, wt, priority,
      |    ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rn
      |  FROM p),
      |t AS (SELECT priority AS tau FROM r WHERE rn = 65),
      |tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS true_total,
      |  COUNT(*) AS n_docs FROM d),
      |c AS (
      |  SELECT COUNT(*) AS n_sample, MIN(tau) AS tau,
      |    CAST(SUM(doc_id) AS BIGINT) AS sample_id_sum,
      |    CAST(SUM(wt) AS BIGINT) AS sample_wt_sum,
      |    CAST(SUM(CASE WHEN CAST(wt AS DOUBLE) > tau THEN wt ELSE 0 END) AS BIGINT) AS sum_heavy,
      |    CAST(SUM(CASE WHEN CAST(wt AS DOUBLE) > tau THEN 0 ELSE 1 END) AS BIGINT) AS n_light
      |  FROM r CROSS JOIN t WHERE rn <= 64)
      |SELECT n_sample, tau, sample_id_sum, sample_wt_sum, sum_heavy, n_light,
      |  CAST(sum_heavy AS DOUBLE) + tau * CAST(n_light AS DOUBLE) AS est_total,
      |  true_total, n_docs
      |FROM c CROSS JOIN tot""".stripMargin

  /** Stratified [[prioritySample]]: a fixed-size weighted draw PER
    * LANGUAGE (16 docs each) instead of one global top-k — the
    * per-stratum budget shape a balanced eval set wants. The plan is the
    * other top-k physical form: a per-group WindowGroupLimit riding ONE
    * hash exchange on the stratum key (rank ≤ k+1 prunes group-locally
    * before any row leaves its partition), where the global variant is a
    * TakeOrderedAndProject. Each stratum's τ is its own (k+1)-th
    * priority and the per-stratum estimator Σmax(w,τ) targets that
    * stratum's weight total — same integer-heavy + τ·count split, so no
    * order-dependent double sums. */
  def prioritySampleStratified(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val d = Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), col("n_chars").as("wt"),
        (hashMod(col("doc_id")) + 1).as("u1"))
      .select(col("lang"), col("doc_id"), col("wt"),
        (col("wt").cast("double") * lit(P) / col("u1")).as("priority"))
    val ranked = d.select(col("lang"), col("doc_id"), col("wt"), col("priority"),
      row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("priority").desc, col("doc_id"))).as("rn"))
      .filter(col("rn") <= k + 1)
    val tau = ranked.filter(col("rn") === k + 1)
      .select(col("lang").as("t_lang"), col("priority").as("tau"))
    val totals = d.groupBy(col("lang").as("g_lang"))
      .agg(sum(col("wt")).as("true_total"), count(lit(1)).as("n_docs"))
    ranked.filter(col("rn") <= k)
      .join(broadcast(tau), col("lang") === col("t_lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sample"),
        min(col("tau")).as("tau"),
        sum(col("doc_id")).as("sample_id_sum"),
        sum(when(col("wt").cast("double") > col("tau"), col("wt"))
          .otherwise(0L)).as("sum_heavy"),
        sum(when(col("wt").cast("double") > col("tau"), 0L)
          .otherwise(1L)).as("n_light"))
      .join(broadcast(totals), col("lang") === col("g_lang"))
      .select(col("lang"), col("n_sample"), col("tau"), col("sample_id_sum"),
        col("sum_heavy"), col("n_light"),
        (col("sum_heavy").cast("double") +
          col("tau") * col("n_light").cast("double")).as("est_total"),
        col("true_total"), col("n_docs"))
  }

  private val prioritySampleStratifiedSql =
    """WITH d AS (
      |  SELECT lang, doc_id, n_chars AS wt,
      |    CAST(n_chars AS DOUBLE) * 1000000007 /
      |      (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),1,15) AS BIGINT)
      |       % 1000000007 + 1) AS priority
      |  FROM documents),
      |r AS (
      |  SELECT lang, doc_id, wt, priority,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority DESC, doc_id) AS rn
      |  FROM d),
      |t AS (SELECT lang AS t_lang, priority AS tau FROM r WHERE rn = 17),
      |tot AS (SELECT lang AS g_lang, CAST(SUM(wt) AS BIGINT) AS true_total,
      |  COUNT(*) AS n_docs FROM d GROUP BY lang),
      |c AS (
      |  SELECT lang, COUNT(*) AS n_sample, MIN(tau) AS tau,
      |    CAST(SUM(doc_id) AS BIGINT) AS sample_id_sum,
      |    CAST(SUM(CASE WHEN CAST(wt AS DOUBLE) > tau THEN wt ELSE 0 END) AS BIGINT) AS sum_heavy,
      |    CAST(SUM(CASE WHEN CAST(wt AS DOUBLE) > tau THEN 0 ELSE 1 END) AS BIGINT) AS n_light
      |  FROM r JOIN t ON lang = t_lang WHERE rn <= 16
      |  GROUP BY lang)
      |SELECT lang, n_sample, tau, sample_id_sum, sum_heavy, n_light,
      |  CAST(sum_heavy AS DOUBLE) + tau * CAST(n_light AS DOUBLE) AS est_total,
      |  true_total, n_docs
      |FROM c JOIN tot ON lang = g_lang""".stripMargin

  /** Rendezvous (highest-random-weight) sharding with the
    * minimal-movement census for a cluster resize (Thaler & Ravishankar
    * 1996 — the stateless alternative to a consistent-hash ring): each
    * doc goes to the shard whose per-(doc, shard) hash is highest, so
    * growing 8 → 9 shards moves ONLY the docs whose new shard 8 score
    * wins (expected 1/9 of the corpus) and every other assignment is
    * untouched — where modulo sharding (`h % n`, q_shard_manifest's
    * layout) would remap ~8/9 of all keys. The census measures exactly
    * that: per old shard, how many docs move, with an id checksum
    * pinning WHICH docs.
    *
    * Scale shape: both assignments are scan-local array argmaxes (9
    * hashes per row, codegen'd); the only exchange is the 8-group
    * census. At 100 TB this is the resize planner you run BEFORE
    * rebalancing a sharded corpus store: moved bytes ≈ total/9, read
    * off a metadata-sized output. */
  def rendezvousShards(s: SparkSession, dir: String): DataFrame = {
    val scores8 =
      "transform(sequence(0, 7), s -> " +
        "graft_hash60(concat(cast(doc_id as string), '#', cast(s as string))))"
    Tables.documents(s, dir)
      .select(col("doc_id"))
      .withColumn("s8", expr(scores8))
      .withColumn("s9", expr(
        "concat(s8, array(graft_hash60(concat(cast(doc_id as string), '#', '8'))))"))
      .select(col("doc_id"),
        (expr("array_position(s8, array_max(s8))") - 1).as("shard_old"),
        (expr("array_position(s9, array_max(s9))") - 1).as("shard_new"))
      .groupBy(col("shard_old"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("shard_new") =!= col("shard_old"), 1L).otherwise(0L))
          .as("n_moved"),
        sum(when(col("shard_new") =!= col("shard_old"), col("doc_id"))
          .otherwise(0L)).as("moved_id_sum"))
  }

  private val rendezvousShardsSql =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 8), s ->
      |      CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(s AS VARCHAR)),1,15) AS BIGINT)) AS s8
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, s8,
      |    list_concat(s8, [CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#8'),1,15) AS BIGINT)]) AS s9
      |  FROM d),
      |a AS (
      |  SELECT doc_id,
      |    list_position(s8, list_max(s8)) - 1 AS shard_old,
      |    list_position(s9, list_max(s9)) - 1 AS shard_new
      |  FROM e)
      |SELECT shard_old, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN shard_new <> shard_old THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
      |  CAST(SUM(CASE WHEN shard_new <> shard_old THEN doc_id ELSE 0 END) AS BIGINT) AS moved_id_sum
      |FROM a GROUP BY shard_old""".stripMargin

  val defs: Seq[GQuery] = Seq(
    GQuery("q_temperature_mix", temperatureMix, Some(temperatureMixSql)),
    GQuery("q_token_budget", tokenBudget, Some(tokenBudgetSql)),
    GQuery("q_sample_priority", prioritySample, Some(prioritySampleSql)),
    GQuery("q_sample_priority_strat", prioritySampleStratified,
      Some(prioritySampleStratifiedSql)),
    GQuery("q_rendezvous_shards", rendezvousShards, Some(rendezvousShardsSql)),
    GQuery("q_shard_manifest", shardManifest, Some(shardManifestSql)))
}

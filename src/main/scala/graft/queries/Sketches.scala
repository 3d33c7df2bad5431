package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Caches, GQuery, Tables}
import graft.core.Caches.TrackedOps
import Qdsl._

/** Deterministic sketch operators: HyperLogLog distinct estimation and
  * Count-Min frequency estimation, built from the portable 60-bit md5
  * hash ([[Qdsl.hash60]]) so the sketch CONTENTS — not just the answers —
  * are bit-identical on any engine. Spark's own `approx_count_distinct`
  * uses a private hash and is not cross-engine checkable; these are, which
  * is also what a production pipeline wants when sketches are persisted
  * and merged across runs (a sketch is only mergeable with sketches built
  * from the same hash family).
  *
  * The reference has no sketch operators; its phase-0 sampler
  * (SURVEY.md §2.6) is the same spirit — a tiny fixed-size summary that
  * replaces a full pass. Sketch state here is a few thousand integer
  * cells, so at 100 TB the register/cell aggregation shuffles a constant
  * number of rows regardless of input size — the whole point.
  */
object Sketches {

  // ------------------------------------------------------- HyperLogLog

  /** HLL distinct-user estimate per event type, m = 256 registers,
    * alongside the exact count so the census doubles as an accuracy
    * check. Register index = low 8 bits of the 60-bit hash; rank =
    * leading-zero count of the remaining 52 bits + 1 (computed as
    * 53 − bitlength, integer-exact on both engines). The estimator is
    * the raw HLL harmonic mean α·m²/Σ2^−M_j, evaluated as integer
    * Σ2^(53−M_j) (≤ 256·2^53 < 2^63, no overflow) followed by one
    * constant-folded double multiply/divide chain — every FP op is
    * correctly rounded in the same order on both engines, so even the
    * DOUBLE estimate matches bitwise.
    *
    * Scale: the register table is |types|·256 rows no matter the input;
    * the one real shuffle carries partial max-registers. Registers are
    * mergeable by max, so per-day sketches union by the same groupBy. */
  /** The 256-register HLL state of an event frame: per (event_type, j),
    * the max rank — shared by the one-shot census and the merge leg. */
  private def hllRegs(df: DataFrame): DataFrame =
    df.select(col("event_type"), hash60(col("user_id")).as("h"))
      .select(col("event_type"), (col("h") % 256).as("j"),
        expr("h DIV 256").as("w"))
      .select(col("event_type"), col("j"),
        when(col("w") === 0, 53)
          .otherwise(lit(53) - length(conv(col("w"), 10, 2))).as("rho"))
      .groupBy(col("event_type"), col("j"))
      .agg(max(col("rho")).as("m"))

  def hllDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = hllRegs(Tables.events(s, dir))
    // dense 256-register grid per type: empty registers contribute 2^53
    val grid = s.range(256).select(col("id").cast("long").as("j"))
      .crossJoin(Tables.events(s, dir).select(col("event_type")).distinct())
    val regs = grid.join(ev, Seq("event_type", "j"), "left")
      .select(col("event_type"), coalesce(col("m"), lit(0)).as("m"))
      .groupBy(col("event_type"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - m)")).as("s"),
        sum(when(col("m") > 0, 1L).otherwise(0L)).as("n_nonzero"),
        sum(col("m").cast("long")).as("reg_checksum"))
    val exact = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    regs.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_exact"), col("n_nonzero"),
        col("reg_checksum"),
        // α₂₅₆·m²·2⁵³ prefolded to one e-notation literal: DuckDB parses
        // plain decimal literals as DECIMAL (different fold), e-notation
        // as DOUBLE on both engines → the single division matches bitwise
        expr("4.2399330249068963e+20 / CAST(s AS DOUBLE)").as("est_hll"))
      // the standard small-range correction: below 2.5m with empty
      // registers, linear counting m·ln(m/V) beats the raw harmonic mean.
      // Floored to BIGINT so a last-ulp ln() difference between engines
      // cannot reach the compared bytes (the value is transcendental —
      // never AT an integer boundary).
      .withColumn("est_final",
        when(col("n_nonzero") < 256 && col("est_hll") <= 640.0,
          floor(lit(256.0) * log(lit(256.0) / (lit(256) - col("n_nonzero")))))
          .otherwise(floor(col("est_hll"))).cast("long"))
  }

  /** HLL sketch MERGE — the law that makes bounded-state distinct
    * counting distributable: Spark splits events at the in-plan
    * 0.8·max(event_id) point, sketches each side separately, merges by
    * register-wise max (256 longs of state per group, the constant-size
    * merge a nightly rollup or shard union performs), and censuses the
    * merged registers; DuckDB sketches the WHOLE stream in one pass.
    * Register-max is associative/commutative/idempotent, so merge ≡
    * rebuild must hold bit-exactly — estimate included — and the oracle
    * proves it against an independent engine (the q_dedup_index_merge
    * pattern applied to sketch state). */
  def hllMerge(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val tDf = ev.agg(expr("MAX(event_id)*4 DIV 5").as("t"))
    val tagged = ev.crossJoin(broadcast(tDf))
    val merged = hllRegs(tagged.filter(col("event_id") < col("t")))
      .unionByName(hllRegs(tagged.filter(col("event_id") >= col("t"))))
      .groupBy(col("event_type"), col("j"))
      .agg(max(col("m")).as("m"))
    val grid = s.range(256).select(col("id").cast("long").as("j"))
      .crossJoin(ev.select(col("event_type")).distinct())
    grid.join(merged, Seq("event_type", "j"), "left")
      .select(col("event_type"), coalesce(col("m"), lit(0)).as("m"))
      .groupBy(col("event_type"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - m)")).as("s"),
        sum(when(col("m") > 0, 1L).otherwise(0L)).as("n_nonzero"),
        sum(col("m").cast("long")).as("reg_checksum"))
      .select(col("event_type"), col("n_nonzero"), col("reg_checksum"),
        expr("4.2399330249068963e+20 / CAST(s AS DOUBLE)").as("est_hll"))
      .withColumn("est_final",
        when(col("n_nonzero") < 256 && col("est_hll") <= 640.0,
          floor(lit(256.0) * log(lit(256.0) / (lit(256) - col("n_nonzero")))))
          .otherwise(floor(col("est_hll"))).cast("long"))
      .drop("est_hll")
  }

  private val hllMergeSql =
    """WITH h AS (
      |  SELECT event_type,
      |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15) AS BIGINT) AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h % 256 AS j,
      |    CASE WHEN h // 256 = 0 THEN 53 ELSE 53 - length(bin(h // 256)) END AS rho
      |  FROM h),
      |m AS (SELECT event_type, j, MAX(rho) AS m FROM r GROUP BY 1, 2),
      |grid AS (
      |  SELECT t.event_type, g.j
      |  FROM range(256) g(j) CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
      |regs AS (
      |  SELECT grid.event_type,
      |    SUM(CAST(1 AS BIGINT) << (53 - COALESCE(m.m, 0))) AS s,
      |    CAST(SUM(CASE WHEN COALESCE(m.m, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
      |    CAST(SUM(COALESCE(m.m, 0)) AS BIGINT) AS reg_checksum
      |  FROM grid LEFT JOIN m ON m.event_type = grid.event_type AND m.j = grid.j
      |  GROUP BY 1)
      |SELECT event_type, n_nonzero, reg_checksum,
      |  CAST(CASE WHEN n_nonzero < 256
      |              AND 4.2399330249068963e+20 / CAST(s AS DOUBLE) <= 640.0
      |    THEN FLOOR(256.0 * ln(256.0 / (256 - n_nonzero)))
      |    ELSE FLOOR(4.2399330249068963e+20 / CAST(s AS DOUBLE)) END AS BIGINT) AS est_final
      |FROM regs""".stripMargin

  private val hllDistinctSql =
    """WITH h AS (
      |  SELECT event_type,
      |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15) AS BIGINT) AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h % 256 AS j,
      |    CASE WHEN h // 256 = 0 THEN 53 ELSE 53 - length(bin(h // 256)) END AS rho
      |  FROM h),
      |m AS (SELECT event_type, j, MAX(rho) AS m FROM r GROUP BY 1, 2),
      |grid AS (
      |  SELECT t.event_type, g.j
      |  FROM range(256) g(j) CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
      |regs AS (
      |  SELECT grid.event_type,
      |    SUM(CAST(1 AS BIGINT) << (53 - COALESCE(m.m, 0))) AS s,
      |    CAST(SUM(CASE WHEN COALESCE(m.m, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
      |    CAST(SUM(COALESCE(m.m, 0)) AS BIGINT) AS reg_checksum
      |  FROM grid LEFT JOIN m ON m.event_type = grid.event_type AND m.j = grid.j
      |  GROUP BY 1),
      |exact AS (
      |  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events GROUP BY 1)
      |SELECT r.event_type, e.n_exact, r.n_nonzero, r.reg_checksum,
      |  4.2399330249068963e+20 / CAST(r.s AS DOUBLE) AS est_hll,
      |  CAST(CASE WHEN r.n_nonzero < 256
      |              AND 4.2399330249068963e+20 / CAST(r.s AS DOUBLE) <= 640.0
      |    THEN FLOOR(256.0 * ln(256.0 / (256 - r.n_nonzero)))
      |    ELSE FLOOR(4.2399330249068963e+20 / CAST(r.s AS DOUBLE)) END AS BIGINT) AS est_final
      |FROM regs r JOIN exact e ON e.event_type = r.event_type""".stripMargin

  // --------------------------------------------------------- Count-Min

  /** Count-Min frequency sketch over the document token stream: depth 3 ×
    * width 1024 cells (each token increments one cell per hash row), read
    * back for the exact top-20 tokens so the output shows estimate ≥ truth
    * with the one-sided CMS error. The cell table is 3072 integers at any
    * corpus size — the sketch aggregation shuffles partial cell counts,
    * the exact top-20 is a second aggregation (kept here precisely so the
    * census is self-validating), and the readback is a broadcast join of
    * 60 probe rows against the cells. */
  def cmsWords(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(explode(words(col("text"))).as("w"))
    val cells = toks
      .select(col("w"), explode(array(lit(0), lit(1), lit(2))).as("d"))
      .select(col("d"), (hashMod(concat_ws("_", col("d"), col("w"))) % 1024).as("pos"))
      .groupBy(col("d"), col("pos"))
      .agg(count(lit(1)).as("c"))
    val top = toks.groupBy(col("w")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("w")).limit(20)
    top
      .select(col("w"), col("n_exact"), explode(array(lit(0), lit(1), lit(2))).as("d"))
      .select(col("w"), col("n_exact"), col("d"),
        (hashMod(concat_ws("_", col("d"), col("w"))) % 1024).as("pos"))
      .join(cells, Seq("d", "pos"))
      .groupBy(col("w"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
      .select(col("w"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
  }

  /** Join-size estimation from Count-Min inner products (the AGMS/CMS
    * estimator — a query optimizer's cardinality model as an explicit,
    * checkable operator): both join columns sketch into depth-3 × 1024
    * cells under the SAME hash family, each depth's inner product
    * Σ_pos aᵢ·bᵢ equals the true join cardinality PLUS the collision
    * mass (counts are non-negative, so collisions only add — the
    * estimate is one-sided above, SketchesSpec pins the law per depth),
    * the min over depths is the estimate, and the exact join size rides
    * along as the truth dial. Scale shape: each sketch is a 3×1024-cell
    * agg (constant size at any table size, mergeable by addition — the
    * q_hll_merge story applies verbatim), the inner product joins 3072
    * cells against 3072, and the exact side is the ordinary key join —
    * at 100 TB you'd DROP the exact side and trust the gauge, which is
    * the point of having calibrated it here. */
  def cmsJoinSize(s: SparkSession, dir: String): DataFrame = {
    def cellsOf(df: DataFrame, key: String): DataFrame = df
      .select(col(key).cast("string").as("k"))
      .select(col("k"), explode(array(lit(0), lit(1), lit(2))).as("d"))
      .select(col("d"),
        (hashMod(concat_ws("_", col("d"), col("k"))) % 1024).as("pos"))
      .groupBy(col("d"), col("pos")).agg(count(lit(1)).as("c"))
    val a = cellsOf(Tables.orders(s, dir), "o_custkey")
    val b = cellsOf(Tables.customer(s, dir), "c_custkey")
      .select(col("d"), col("pos"), col("c").as("cb"))
    val est = a.join(b, Seq("d", "pos"))
      .groupBy(col("d"))
      .agg(sum(col("c") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est_rows"), max(col("ip")).as("est_worst"))
    val n1 = Tables.orders(s, dir).agg(count(lit(1)).as("f1a"))
    val n2 = Tables.customer(s, dir).agg(count(lit(1)).as("f1b"))
    val exact = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("exact_rows"))
    exact.crossJoin(broadcast(est))
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select(col("exact_rows"), col("est_rows"), col("est_worst"),
        (col("est_rows") - col("exact_rows")).as("overcount"),
        // expected collision mass under uniform hashing is F1a·F1b/w —
        // subtracting it is the standard mean correction, and how close
        // it lands (6% on this corpus) is the calibration evidence
        expr("est_rows - (f1a * f1b) DIV 1024").as("est_corrected"))
  }

  private val cmsJoinSizeSql =
    """WITH ka AS (SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders),
      |kb AS (SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer),
      |ca AS (
      |  SELECT d.d,
      |    CAST('0x' || substring(md5(CAST(d.d AS VARCHAR) || '_' || k),1,15) AS BIGINT) % 1000000007 % 1024 AS pos,
      |    COUNT(*) AS c
      |  FROM ka CROSS JOIN range(3) d(d) GROUP BY 1, 2),
      |cb AS (
      |  SELECT d.d,
      |    CAST('0x' || substring(md5(CAST(d.d AS VARCHAR) || '_' || k),1,15) AS BIGINT) % 1000000007 % 1024 AS pos,
      |    COUNT(*) AS c
      |  FROM kb CROSS JOIN range(3) d(d) GROUP BY 1, 2),
      |ip AS (
      |  SELECT ca.d, CAST(SUM(ca.c * cb.c) AS BIGINT) AS ip
      |  FROM ca JOIN cb ON ca.d = cb.d AND ca.pos = cb.pos GROUP BY ca.d),
      |est AS (
      |  SELECT CAST(MIN(ip) AS BIGINT) AS est_rows,
      |    CAST(MAX(ip) AS BIGINT) AS est_worst FROM ip),
      |ex AS (
      |  SELECT COUNT(*) AS exact_rows
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |f1 AS (
      |  SELECT (SELECT COUNT(*) FROM orders) AS f1a,
      |    (SELECT COUNT(*) FROM customer) AS f1b)
      |SELECT exact_rows, est_rows, est_worst,
      |  est_rows - exact_rows AS overcount,
      |  CAST(est_rows - (f1a * f1b) // 1024 AS BIGINT) AS est_corrected
      |FROM ex CROSS JOIN est CROSS JOIN f1""".stripMargin

  private val cmsWordsSql =
    s"""WITH toks AS (
      |  SELECT unnest($wordsSqlDoc) AS w FROM documents),
      |cells AS (
      |  SELECT d.d,
      |    CAST('0x' || substring(md5(CAST(d.d AS VARCHAR) || '_' || w),1,15) AS BIGINT) % 1000000007 % 1024 AS pos,
      |    COUNT(*) AS c
      |  FROM toks CROSS JOIN range(3) d(d)
      |  GROUP BY 1, 2),
      |top AS (
      |  SELECT w, COUNT(*) AS n_exact FROM toks GROUP BY w
      |  ORDER BY n_exact DESC, w LIMIT 20),
      |probe AS (
      |  SELECT t.w, t.n_exact, d.d,
      |    CAST('0x' || substring(md5(CAST(d.d AS VARCHAR) || '_' || t.w),1,15) AS BIGINT) % 1000000007 % 1024 AS pos
      |  FROM top t CROSS JOIN range(3) d(d)),
      |est AS (
      |  SELECT p.w, p.n_exact, MIN(c.c) AS n_est
      |  FROM probe p JOIN cells c ON c.d = p.d AND c.pos = p.pos
      |  GROUP BY 1, 2)
      |SELECT w, n_exact, n_est, n_est - n_exact AS overcount FROM est""".stripMargin

  // ------------------------------------------- K-minimum-values (KMV)

  /** KMV sketch size. Relative error ~ 1/√k ≈ 12.5% — a test-scale
    * choice; production grows k with the accuracy target. */
  private val KmvK = 64

  /** KMV (bottom-k) sketches with set-INTERSECTION estimation — the
    * operation HLL registers cannot do (max-merge only supports union):
    * keep the k smallest distinct hashes per set; the union sketch is the
    * k smallest of the merged sketches; ρ = how many union-sketch members
    * sit in both sides estimates the Jaccard, and |A∪B| comes from the
    * k-th minimum (θ-estimator, (k−1)/θ). Everything is integer-exact
    * except one correctly-rounded double division, and the census carries
    * the exact union/intersection for self-validation.
    *
    * Scale shape: each bottom-k is `orderBy(h).limit(k)` — Spark lowers
    * it to TakeOrderedAndProject (per-partition k-min, then a k-row
    * merge), so the full corpus never sorts and the sketch is k rows no
    * matter the input; sketches from different shards/days merge by the
    * same k-min-of-concatenation. */
  def kmvIntersect(s: SparkSession, dir: String): DataFrame = {
    // ONE events pass feeds both sketches and both exact sides: the
    // (type, user) distinct is lazily cached — without it the eight
    // downstream references would each re-plan the full scan + distinct
    // (DataFrames do no common-subplan reuse)
    val u = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("user_id")).distinct().trackedPersist()
    def users(t: String): DataFrame =
      u.filter(col("event_type") === t).select(col("user_id"))
    // distinct over the HASHES: a 60-bit collision inside the bottom-k
    // would otherwise row-multiply the membership joins on the Spark
    // side while DuckDB's IN keeps set semantics
    def kmv(t: String): DataFrame =
      users(t).select(hash60(col("user_id")).as("h")).distinct()
        .orderBy(col("h")).limit(KmvK)
    val a = kmv("click")
    val b = kmv("purchase")
    val ku = a.union(b).distinct().orderBy(col("h")).limit(KmvK)
    val stats = ku
      .join(a.select(col("h"), lit(1L).as("in_a")), Seq("h"), "left")
      .join(b.select(col("h"), lit(1L).as("in_b")), Seq("h"), "left")
      .agg(max(col("h")).as("kth_union"),
        count(lit(1)).as("n_sketch"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("rho"))
    val exactU = users("click").union(users("purchase")).distinct()
      .agg(count(lit(1)).as("exact_union"))
    val exactI = users("click").intersect(users("purchase"))
      .agg(count(lit(1)).as("exact_inter"))
    stats.crossJoin(exactU).crossJoin(exactI)
      // a sketch that never filled holds the ENTIRE set — its size IS the
      // exact cardinality; the θ-estimator applies only at a full sketch.
      // (k−1)·2^60 = 63·2^60 is exactly representable in a double (6-bit
      // mantissa), the division is correctly rounded on both engines,
      // floor lands on the same integer
      .withColumn("est_union",
        when(col("n_sketch") < KmvK, col("n_sketch"))
          .otherwise(floor(expr("7.2634054790231359488e19 / CAST(kth_union AS DOUBLE)"))
            .cast("long")))
      .withColumn("est_inter", expr("rho * est_union DIV n_sketch"))
      .select(col("kth_union"), col("n_sketch"), col("rho"), col("est_union"),
        col("exact_union"), col("est_inter"), col("exact_inter"))
  }

  private val kmvIntersectSql =
    s"""WITH ua AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
      |ub AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
      |a AS (SELECT CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15) AS BIGINT) AS h
      |      FROM ua ORDER BY h LIMIT $KmvK),
      |b AS (SELECT CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)),1,15) AS BIGINT) AS h
      |      FROM ub ORDER BY h LIMIT $KmvK),
      |ku AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) t
      |       ORDER BY h LIMIT $KmvK),
      |st AS (
      |  SELECT MAX(h) AS kth_union, COUNT(*) AS n_sketch,
      |    CAST(SUM(CASE WHEN h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)
      |        THEN 1 ELSE 0 END) AS BIGINT) AS rho
      |  FROM ku),
      |eu AS (SELECT COUNT(*) AS exact_union FROM
      |       (SELECT user_id FROM ua UNION SELECT user_id FROM ub) t),
      |ei AS (SELECT COUNT(*) AS exact_inter FROM
      |       (SELECT user_id FROM ua INTERSECT SELECT user_id FROM ub) t),
      |est AS (
      |  SELECT kth_union, n_sketch, rho,
      |    CASE WHEN n_sketch < $KmvK THEN n_sketch
      |      ELSE CAST(FLOOR(7.2634054790231359488e19 / CAST(kth_union AS DOUBLE)) AS BIGINT)
      |    END AS est_union
      |  FROM st)
      |SELECT kth_union, n_sketch, rho, est_union, exact_union,
      |  CAST(rho * est_union // n_sketch AS BIGINT) AS est_inter, exact_inter
      |FROM est CROSS JOIN eu CROSS JOIN ei""".stripMargin

  val defs: Seq[GQuery] = Seq(
    GQuery("q_hll_distinct", hllDistinct, Some(hllDistinctSql)),
    GQuery("q_hll_merge", hllMerge, Some(hllMergeSql)),
    GQuery("q_cms_join_size", cmsJoinSize, Some(cmsJoinSizeSql)),
    GQuery("q_cms_words", cmsWords, Some(cmsWordsSql)),
    GQuery("q_kmv_intersect", kmvIntersect, Some(kmvIntersectSql)))
}

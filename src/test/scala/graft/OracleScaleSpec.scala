package graft

import org.scalatest.funsuite.AnyFunSuite

/** Tripwire for the ORACLE-side scale rewrites the replica drives made
  * load-bearing (r10 10×, r12 100×). These DuckDB formulations exist
  * only so the oracle survives replica-scale corpora — nothing in the
  * sf0.01 gate would catch a revert, and each revert class has already
  * burned a drive once:
  *
  *   - `AS MATERIALIZED` on multiply-referenced CTEs: DuckDB inlines
  *     plain CTEs per reference, so an iterative chain re-evaluates the
  *     base 2^depth times (q_hits burned 9+ CPU-hours and spilled a disk
  *     at 10× before r10 pinned it).
  *   - List-comprehension distances (`[expr for i in range(1,D+1)]`)
  *     instead of per-dimension unnest joins: the dim-join formulation
  *     ground unboundedly at the r12 100× volume (205k vectors).
  *   - `list_transform` chunk enumeration instead of
  *     `CROSS JOIN range(N)`: the cross join materializes docs×N wide
  *     rows before its filter and OOM-killed DuckDB at 555k docs
  *     (q_dedup_rewrite, r12) — and the bounded range() silently caps
  *     fan-out where the list form is exact at any document length.
  *   - The VARCHAR hop on decimal-SUM→DOUBLE casts
  *     (`CAST(CAST(SUM(dec) AS VARCHAR) AS DOUBLE)`): DuckDB's direct
  *     cast double-rounds (int128→double, then ÷10^scale) and diverges
  *     from Spark by 1 ULP once the sum's unscaled value crosses 2^53
  *     (q1 at 10×, r10). Integer SUMs are exempt — int64→double is one
  *     correctly-rounded conversion in both engines at any magnitude.
  *
  * No SparkSession needed: this pins the SQL TEXT the driver will hand
  * DuckDB. SURVEY §9 lists the same formulations narratively. */
class OracleScaleSpec extends AnyFunSuite {

  private val oracles: Map[String, String] = SparkEntry.oracleSql

  /** Queries whose multiply-referenced CTEs must stay MATERIALIZED —
    * each was either measured to explode un-materialized (q_hits,
    * q_dedup_rewrite, the components family) or shares the
    * twice-referenced iterative shape that does. */
  private val materializedRequired = Seq(
    "q17_small_qty_revenue", "q20_excess_shippers", "q21_waiting_supplier",
    "q_dedup_keep_best", "q_dedup_rewrite", "q_dup_clusters",
    "q_dup_clusters_conv", "q_dup_clusters_star", "q_hits", "q_kcore",
    "q_kcore_powerlaw", "q_semdedup", "q_split_leakfree",
    "q_kmeans_iter2", "q_ann_ivf_trained")

  /** Vector oracles whose distances must stay list-comprehensions (no
    * per-dim unnest join — the `.dim = ` equi-join shape that builds
    * n×64×k intermediate rows and ground unboundedly at 100×). */
  private val listCompRequired = Seq(
    "q_ann_ivf", "q_ann_ivf_trained", "q_ann_ivfpq", "q_ann_pq",
    "q_knn_brute", "q_kmeans_assign", "q_kmeans_iter2", "q_semdedup",
    "q_embed_neardup")

  test("multiply-referenced CTE oracles stay AS MATERIALIZED") {
    val missing = materializedRequired.filter { q =>
      !oracles.getOrElse(q, "").contains("MATERIALIZED")
    }
    assert(missing.isEmpty,
      s"oracles lost their AS MATERIALIZED (DuckDB re-inlines per " +
        s"reference — the q_hits 10x blowup): ${missing.mkString(", ")}")
  }

  test("vector-distance oracles stay list-comprehensions, not dim joins") {
    val comprehension = """for \w+ in range\(""".r
    val broken = listCompRequired.filter { q =>
      val sql = oracles.getOrElse(q, "")
      comprehension.findFirstIn(sql).isEmpty || sql.contains(".dim = ")
    }
    assert(broken.isEmpty,
      s"oracles reverted to per-dimension unnest joins (ground " +
        s"unboundedly at the r12 100x drive): ${broken.mkString(", ")}")
  }

  test("q_dedup_rewrite chunks via list_transform, never CROSS JOIN range") {
    val sql = oracles("q_dedup_rewrite")
    assert(sql.contains("list_transform"),
      "q_dedup_rewrite lost its exact per-doc chunk enumeration")
    assert(!sql.contains("CROSS JOIN range"),
      "q_dedup_rewrite reverted to the docsxN cross join that " +
        "OOM-killed DuckDB at 555k docs (r12)")
  }

  test("no oracle casts a decimal SUM to DOUBLE without the VARCHAR hop") {
    // the trap shape: CAST(SUM(<something decimal>) AS DOUBLE) — walk
    // the parens to find the SUM's close and inspect what follows.
    // Integer SUMs (no DECIMAL in the argument) are exempt.
    def violations(sql: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = sql.indexOf("CAST(SUM(")
      while (i >= 0) {
        var depth = 0
        var m = i + "CAST(SUM".length // at the SUM's '('
        var end = -1
        while (m < sql.length && end < 0) {
          sql(m) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = m
            case _ =>
          }
          m += 1
        }
        if (end > 0) {
          val arg = sql.substring(i + "CAST(SUM(".length, end)
          val after = sql.substring(end + 1).dropWhile(_.isWhitespace)
          if (after.startsWith("AS DOUBLE") && arg.contains("DECIMAL"))
            out += sql.substring(i, math.min(sql.length, end + 12))
        }
        i = sql.indexOf("CAST(SUM(", i + 1)
      }
      out.result()
    }
    val bad = oracles.toSeq.sortBy(_._1)
      .flatMap { case (q, sql) => violations(sql).map(v => s"$q: $v") }
    assert(bad.isEmpty,
      "decimal-SUM casts must take the VARCHAR hop (1-ULP divergence " +
        s"past 2^53 — the r10 q1 finding):\n${bad.mkString("\n")}")
  }
}

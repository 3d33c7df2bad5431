package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.SparkPlan

/** Golden physical-plan census over the ENTIRE query registry: for every
  * registered query, the counts of shuffle exchanges, broadcast
  * exchanges, file scans, and join strategies are pinned against a
  * checked-in golden file. This is the regression net wall-clock noise
  * cannot provide — an accidental extra shuffle, a lost broadcast, or a
  * surprise cartesian changes the census immediately, on any host, in
  * milliseconds.
  *
  * Regenerate after an INTENTIONAL plan change:
  * {{{
  * GOLDEN_REGEN=1 sbt "testOnly graft.GoldenPlanSpec"   // rewrites the file
  * git diff src/test/resources/golden_plans.tsv          // review the drift
  * }}}
  * The file is TSV (name, exchanges, broadcasts, scans, smj, bhj, shj,
  * cartesian, sorts) sorted by name — diffs read line-per-query.
  */
class GoldenPlanSpec extends SparkSpec {

  private val goldenPath = "src/test/resources/golden_plans.tsv"

  private case class Census(ex: Int, bc: Int, scan: Int, smj: Int,
      bhj: Int, shj: Int, cart: Int, sort: Int) {
    def tsv(name: String) = s"$name\t$ex\t$bc\t$scan\t$smj\t$bhj\t$shj\t$cart\t$sort"
  }

  private def census(p: SparkPlan): Census = {
    // collect counts by simple class name over the whole tree, including
    // reused subtrees (ReusedExchange counts as its own kind — a reuse
    // becoming a re-execution WOULD show as an exchange-count change)
    var ex, bc, scan, smj, bhj, shj, cart, sort = 0
    p.foreach { n =>
      n.getClass.getSimpleName match {
        case "ShuffleExchangeExec" => ex += 1
        case "BroadcastExchangeExec" => bc += 1
        case "FileSourceScanExec" | "BatchScanExec" => scan += 1
        case "SortMergeJoinExec" => smj += 1
        case "BroadcastHashJoinExec" | "BroadcastNestedLoopJoinExec" => bhj += 1
        case "ShuffledHashJoinExec" => shj += 1
        case "CartesianProductExec" => cart += 1
        case "SortExec" => sort += 1
        case _ =>
      }
    }
    Census(ex, bc, scan, smj, bhj, shj, cart, sort)
  }

  test("physical-plan census matches the golden file for every registered query") {
    // census the STATIC plan: under AQE the executedPlan is a single
    // AdaptiveSparkPlanExec wrapper whose tree only materializes at run
    // time, so the census would read all-zero; the static plan is the
    // deterministic pre-runtime shape (AQE can only improve on it)
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val lines = try {
      SparkEntry.registry.map { q =>
        val c = try census(q.run(spark, sfDir).queryExecution.executedPlan)
        finally graft.core.Caches.release()
        c.tsv(q.name)
      }.sorted
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
    val regen = sys.env.get("GOLDEN_REGEN").contains("1")
    val path = Paths.get(goldenPath)
    if (regen || !Files.exists(path)) {
      Files.createDirectories(path.getParent)
      Files.writeString(path, lines.mkString("", "\n", "\n"))
      info(s"golden plan census ${if (regen) "regenerated" else "created"}: " +
        s"$goldenPath (${lines.size} queries)")
    } else {
      val golden = Files.readString(path).split("\n").filter(_.nonEmpty).toSeq
      val goldenMap = golden.map(l => l.split("\t").head -> l).toMap
      val nowMap = lines.map(l => l.split("\t").head -> l).toMap
      val missing = goldenMap.keySet -- nowMap.keySet
      val added = nowMap.keySet -- goldenMap.keySet
      val drifted = (goldenMap.keySet & nowMap.keySet)
        .filter(k => goldenMap(k) != nowMap(k)).toSeq.sorted
      assert(missing.isEmpty && drifted.isEmpty,
        s"""plan census drift (GOLDEN_REGEN=1 to accept an intentional change):
           |  removed: ${missing.toSeq.sorted.mkString(", ")}
           |  drifted:
           |${drifted.map(k => s"    golden ${goldenMap(k)}\n    now    ${nowMap(k)}").mkString("\n")}
           |""".stripMargin)
      // new queries are fine — they just need to land in the golden file
      if (added.nonEmpty) {
        Files.writeString(path, lines.mkString("", "\n", "\n"))
        info(s"golden extended with ${added.size} new queries: " +
          added.toSeq.sorted.mkString(", "))
      }
    }
  }
}

package graft

/** Whole-registry plan hygiene: every declared query must build a
  * physical plan at sf0.001 (catches analysis breakage in queries the
  * other specs don't individually exercise) and none may plan a
  * CartesianProduct — the non-broadcast cross join that turns into an
  * executors×executors shuffle at scale. (Broadcast nested-loop joins of
  * deliberately tiny sides — query sets, centroid tables, 1-row counts —
  * are fine and appear as BroadcastNestedLoopJoin, not CartesianProduct.)
  */
class RegistryPlanSpec extends SparkSpec {

  test("every registry query plans, and none plans a CartesianProduct") {
    val offenders = SparkEntry.registry.flatMap { q =>
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }
}

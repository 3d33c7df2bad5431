package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** The construction contract: building a registry query's DataFrame must
  * not run Spark jobs — plans are declared, actions execute them. The
  * exception is the DRIVER-ITERATIVE operators (PageRank, components,
  * k-core, Lloyd steps, boundary decision...), whose loop rounds are
  * jobs by design; those are pinned in an exact allowlist so a new
  * query can't silently start paying construction-time work (the
  * write-at-construction asymmetry the deferred sink→source stage,
  * graft.plans.DeferredIngest, exists to prevent).
  */
class RegistryPlanSpec extends SparkSpec {

  /** Queries whose CONSTRUCTION legitimately executes jobs: driver
    * iteration with eager checkpoints, or an explicit materialization
    * the operator's convergence/boundary decision requires. */
  private val iterativeByDesign = Set(
    "q_pagerank", "q_pagerank_double",       // rank rounds + final checkpoint
    "q_kcore", "q_kcore_powerlaw",           // peel cascade
    "q_dup_clusters", "q_dup_clusters_conv", "q_dup_clusters_star",
    "q_sssp", "q_bfs_hops", "q_hits",        // frontier/fixpoint rounds
    "q_gensort_checksum")                    // spark.range sized from a
                                             // data count (gensort's n
                                             // CLI parameter)

  test("construction runs zero jobs outside the iterative allowlist") {
    val sc = spark.sparkContext
    val counts = new ConcurrentHashMap[String, Integer]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = js.properties.getProperty("spark.jobGroup.id")
        if (g != null && g.startsWith("construct:"))
          counts.merge(g, 1, (a, b) => a + b)
      }
    }
    sc.addSparkListener(listener)
    try {
      SparkEntry.registry.foreach { q =>
        sc.setJobGroup(s"construct:${q.name}", "RegistryPlanSpec", false)
        try q.run(spark, sfDir)
        finally sc.clearJobGroup()
      }
      // the listener bus is async — give it a beat to drain before
      // reading the counts (events for a run job post within millis;
      // 2 s is orders of magnitude of slack)
      Thread.sleep(2000)
      val offenders = SparkEntry.registry.map(_.name)
        .filterNot(iterativeByDesign)
        .filter(n => counts.containsKey(s"construct:$n"))
      assert(offenders.isEmpty,
        s"queries ran jobs at construction: ${offenders.mkString(", ")} " +
          s"(counts: ${offenders.map(n => counts.get(s"construct:$n")).mkString(",")})")
      // the allowlist stays exact — an entry that stops executing at
      // construction should be removed, not linger
      val stale = iterativeByDesign
        .filterNot(n => counts.containsKey(s"construct:$n"))
      assert(stale.isEmpty,
        s"allowlisted queries no longer run construction jobs: $stale")
    } finally {
      sc.removeSparkListener(listener)
      graft.core.Caches.release()
    }
  }
}

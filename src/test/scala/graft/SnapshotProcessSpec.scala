package graft

import graft.streaming.SnapshotStore

/** The multi-writer claim CAS across OS PROCESSES — the case the in-JVM
  * SnapshotContentionSpec structurally cannot cover: its 4 threads share
  * the per-table JVM lock, so the local-filesystem claim create never
  * actually races. Here two forked JVMs (the LocalClusterSpec forking
  * discipline) append concurrently through the NIO `CREATE_NEW` claim
  * CAS (SnapshotStore.tryClaim's file:// branch — one O_CREAT|O_EXCL
  * syscall, the real cross-process exclusion) and the parent asserts the
  * same invariants as the in-JVM drive: contiguous versions (no lost
  * commit, no double-claim), exact history multiset, exact content.
  *
  * Gated behind SPARK_CLUSTER_CHECK=1 like LocalClusterSpec (each forked
  * writer boots a full SparkSession); part of the per-round ritual:
  * {{{
  * SPARK_CLUSTER_CHECK=1 sbt "testOnly graft.SnapshotProcessSpec"
  * }}} */
class SnapshotProcessSpec extends SparkSpec {
  import spark.implicits._

  private val Writers = 2
  private val AppendsPerWriter = 12

  /** JDK-17 module opens Spark needs when launched outside spark-submit —
    * the same list build.sbt passes to forked test JVMs. */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two forked JVMs appending through the claim CAS: contiguous " +
      "versions, exact history, exact content") {
    assume(sys.env.get("SPARK_CLUSTER_CHECK").contains("1"),
      "two-process contention drive runs in the gated ritual: " +
        "SPARK_CLUSTER_CHECK=1 sbt 'testOnly graft.SnapshotProcessSpec'")
    val root = java.nio.file.Files.createTempDirectory("snapproc")
    val tableDir = root.resolve("table").toString
    val syncDir = root.resolve("sync").toString
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val procs = (0 until Writers).map { id =>
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx2g",
        "-cp", sys.props("java.class.path"),
        "graft.SnapshotWriterProc",
        tableDir, id.toString, AppendsPerWriter.toString, syncDir))
      new ProcessBuilder(cmd: _*)
        .redirectOutput(root.resolve(s"writer-$id.log").toFile)
        .redirectErrorStream(true)
        .start()
    }
    // both sessions up → fire the go signal so every append races a
    // live foreign process, not a finished one
    val readyDeadline = System.nanoTime() + 120L * 1000000000L
    def allReady = (0 until Writers).forall(id =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(syncDir, s"ready-$id")))
    while (!allReady) {
      if (System.nanoTime() > readyDeadline || procs.exists(!_.isAlive)) {
        procs.foreach(_.destroyForcibly())
        fail(s"a writer died or was not ready in 120s; logs under $root")
      }
      Thread.sleep(50)
    }
    java.nio.file.Files.createFile(java.nio.file.Paths.get(syncDir, "go"))
    procs.zipWithIndex.foreach { case (p, id) =>
      val done = p.waitFor(10, java.util.concurrent.TimeUnit.MINUTES)
      if (!done) p.destroyForcibly()
      assert(done,
        s"writer $id did not finish in 10min (log: $root/writer-$id.log)")
      assert(p.exitValue() == 0,
        s"writer $id exited ${p.exitValue()} (log: $root/writer-$id.log)")
    }

    val total = Writers * AppendsPerWriter
    // contiguous versions 1..N — no lost commit, no double-claimed
    // version, even though the claimants never shared a JVM lock
    val hist = SnapshotStore.history(spark, tableDir)
      .select("version", "operation")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(hist.map(_._1).toSeq === (1L to total.toLong),
      s"non-contiguous versions: ${hist.map(_._1).mkString(",")}")
    assert(hist.forall(_._2 == "append"),
      s"unexpected history labels: ${hist.map(_._2).distinct.mkString(",")}")
    // content = exact union of both writers' disjoint key ranges
    val want = (for {
      id <- 0 until Writers
      i <- 0 until AppendsPerWriter
      j <- 0 until 3
    } yield {
      val k = id * 100000L + i * 3 + j
      k -> k * 10
    }).toMap
    val got = SnapshotStore.read(spark, tableDir).get
      .as[(Long, Long)].collect().toMap
    assert(got === want,
      s"final snapshot diverged: ${got.size} vs ${want.size} keys")
  }
}

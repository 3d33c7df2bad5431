package graft

import org.apache.spark.sql.functions.col

import graft.streaming.SnapshotStore

/** The multi-writer claim CAS under REAL contention — not the r10/r11
  * one-appender-vs-one-maintainer race but 4 concurrent writers issuing
  * ~100 mixed commits (append/merge/delete/compact) against one table.
  * Invariants asserted over the whole run:
  *   - versions are contiguous 1..N (monotone, no gap = no lost commit,
  *     no collision = no double-claimed version),
  *   - DESCRIBE HISTORY's operation labels are exactly the multiset of
  *     verbs issued,
  *   - the final snapshot equals the union of each thread's
  *     deterministic thread-local expectation (threads touch disjoint
  *     key ranges, so per-thread op order — which each thread observes,
  *     since its calls return only after their commit seals — fixes the
  *     final content regardless of the global interleave; compacts are
  *     content-preserving by contract).
  * Plus the crashed-claimant path: an orphaned foreign claim blocks the
  * table with a staleness-aware timeout message, [[SnapshotStore
  * .releaseClaim]] recovers, and the next commit chains correctly. */
class SnapshotContentionSpec extends SparkSpec {
  import spark.implicits._

  private val Threads = 4
  private val AppendsPerThread = 15 // + 4 merges + 3 deletes + 3 compacts

  test("4 concurrent writers x ~100 mixed verbs: contiguous versions, " +
      "exact history, exact content") {
    val dir = java.nio.file.Files.createTempDirectory("snapcontend").toString
    // per-thread ground truth, updated in thread-local issue order
    val expected = Array.fill(Threads)(
      scala.collection.mutable.Map.empty[Long, Long])
    val issued = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]()
    def count(op: String): Unit =
      issued.computeIfAbsent(op,
        _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    def runThread(t: Int): Unit = try {
      val base = t * 1000L
      for (i <- 0 until AppendsPerThread) {
        // append 3 fresh keys via the real foreachBatch path (globally
        // unique batch ids — threads own disjoint id ranges)
        val keys = (0 until 3).map(j => base + i * 3 + j)
        SnapshotStore.appendWriter(dir)(
          keys.map(k => (k, k * 10)).toDF("k", "v"), base + i)
        keys.foreach(k => expected(t)(k) = k * 10)
        count("append")
        i match {
          case 2 | 6 | 9 | 12 => // upsert: bump 2 of this thread's keys
            val up = Seq(base + i * 3, base + i * 3 + 1).map(k => (k, k * 10 + 1))
            SnapshotStore.merge(spark, dir, up.toDF("k", "v"), "k")
            up.foreach { case (k, v) => expected(t)(k) = v }
            count("merge")
          case 4 | 8 | 13 => // delete one of this thread's earlier keys
            val gone = base + (i - 1) * 3
            SnapshotStore.deleteWhere(spark, dir, col("k") === gone)
            expected(t).remove(gone)
            count("delete")
          case _ =>
        }
        if (i == 5 || i == 10 || i == 14) { // content-preserving rewrite
          SnapshotStore.compact(spark, dir, targetFiles = 2)
          count("compact")
        }
      }
    } catch { case e: Throwable => errors.add(e) }

    val pool = (0 until Threads).map { t =>
      val th = new Thread(() => runThread(t), s"writer-$t")
      th.start(); th
    }
    pool.foreach(_.join(20 * 60 * 1000L))
    assert(errors.isEmpty, s"writer failed: ${Option(errors.peek())}")

    val totalOps = issued.values().stream().mapToInt(_.get()).sum()
    assert(totalOps === Threads * (15 + 4 + 3 + 3), s"ops issued: $totalOps")

    // versions contiguous 1..N — no lost commit, no double-claim
    val hist = SnapshotStore.history(spark, dir)
      .select("version", "operation")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(hist.map(_._1).toSeq === (1L to totalOps).toSeq,
      s"non-contiguous versions: ${hist.map(_._1).mkString(",")}")
    // history labels = the exact multiset of issued verbs
    val labelCounts = hist.groupBy(_._2).view.mapValues(_.length).toMap
    val issuedCounts = {
      import scala.jdk.CollectionConverters._
      issued.asScala.map { case (k, v) => k -> v.get() }.toMap
    }
    assert(labelCounts === issuedCounts,
      s"history labels $labelCounts != issued $issuedCounts")

    // final content = union of per-thread deterministic expectations
    val want = expected.flatMap(_.toSeq).toMap
    val got = SnapshotStore.read(spark, dir).get
      .as[(Long, Long)].collect().toMap
    assert(got.size === want.size &&
      got === want, s"final snapshot diverged: ${got.size} vs ${want.size} keys")

    // every committed version still reads (no orphaned manifests): spot
    // the quartiles rather than all ~100 (runtime)
    for (v <- Seq(1L, totalOps / 4L, totalOps / 2L, totalOps.toLong)) {
      assert(SnapshotStore.read(spark, dir, Some(v)).isDefined, s"v$v unreadable")
    }
  }

  test("replay after crash-before-marker ADOPTS even once a compact " +
      "rewrote the batch's files") {
    // the replay-idempotence hole: batch seals version n, writer dies
    // before b<id>.done; a compact then rewrites n's files into data/d*
    // so the NEWEST manifest no longer lists data/b<id>. A newest-only
    // adoption check would re-commit the batch (duplicate rows) and
    // mode(overwrite) on data/b<id> would orphan version n's manifest
    // for pinned readers — adoption must scan every committed manifest.
    val dir = java.nio.file.Files.createTempDirectory("snapadopt").toString
    val rows = Seq((1L, 10L), (2L, 20L))
    SnapshotStore.appendWriter(dir)(rows.toDF("k", "v"), 0L)
    val marker = new java.io.File(s"$dir/manifest/b0.done")
    assert(marker.delete(), "test setup: simulate crash before marker")
    val partsBefore = new java.io.File(s"$dir/data/b0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
    SnapshotStore.compact(spark, dir, targetFiles = 1) // rewrites into data/d2
    // replay of batch 0: must adopt (marker only), not re-commit
    SnapshotStore.appendWriter(dir)(rows.toDF("k", "v"), 0L)
    assert(marker.exists(), "replay did not restore the batch marker")
    val hist = SnapshotStore.history(spark, dir)
      .select("version", "operation").as[(Long, String)].collect().sortBy(_._1)
    assert(hist.toSeq === Seq((1L, "append"), (2L, "compact")),
      s"replay re-committed the batch: ${hist.mkString(",")}")
    assert(SnapshotStore.read(spark, dir).get.as[(Long, Long)]
      .collect().sorted.toSeq === rows.sorted, "rows duplicated or lost")
    // pinned version 1 still reads its ORIGINAL bytes — no part-file
    // names regenerated under data/b0
    val partsAfter = new java.io.File(s"$dir/data/b0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
    assert(partsAfter === partsBefore, "replay rewrote the sealed batch dir")
    assert(SnapshotStore.read(spark, dir, Some(1L)).get.as[(Long, Long)]
      .collect().sorted.toSeq === rows.sorted, "pinned v1 broken")
  }

  test("crashed claimant: staleness-aware timeout, releaseClaim recovery, " +
      "clean chaining after") {
    val dir = java.nio.file.Files.createTempDirectory("snapcrash").toString
    SnapshotStore.appendWriter(dir)(Seq((1L, 10L)).toDF("k", "v"), 0L)
    // a foreign writer claims v2 and dies before sealing
    val claim = new java.io.File(s"$dir/manifest/v2.claim")
    java.nio.file.Files.write(claim.toPath, "dead-writer".getBytes("UTF-8"))
    val e = intercept[RuntimeException] {
      SnapshotStore.commitVersion(spark, dir, op = "append",
        token = "b99", waitMs = 400L) { (prev, _) => prev.get }
    }
    // fresh claim → the message must steer AWAY from releaseClaim
    // (releasing a live writer's claim is the double-commit hazard)
    assert(e.getMessage.contains("dead-writer"), e.getMessage)
    assert(e.getMessage.contains("do NOT releaseClaim"), e.getMessage)
    // age the claim past the staleness threshold → now it names recovery
    claim.setLastModified(System.currentTimeMillis() - 16 * 60 * 1000L)
    val e2 = intercept[RuntimeException] {
      SnapshotStore.commitVersion(spark, dir, op = "append",
        token = "b99", waitMs = 400L) { (prev, _) => prev.get }
    }
    assert(e2.getMessage.contains("releaseClaim"), e2.getMessage)
    assert(!e2.getMessage.contains("do NOT"), e2.getMessage)
    // operator recovery: release, then the next commit claims v2 cleanly
    assert(SnapshotStore.releaseClaim(spark, dir, 2L))
    SnapshotStore.appendWriter(dir)(Seq((2L, 20L)).toDF("k", "v"), 1L)
    val hist = SnapshotStore.history(spark, dir)
      .select("version").as[Long].collect().sorted.toSeq
    assert(hist === Seq(1L, 2L), s"post-recovery versions: $hist")
    assert(SnapshotStore.read(spark, dir).get.as[(Long, Long)]
      .collect().toSet === Set((1L, 10L), (2L, 20L)))
  }
}

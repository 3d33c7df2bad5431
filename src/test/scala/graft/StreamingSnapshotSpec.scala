package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.SnapshotStore

/** The stream-driven snapshot table: per-batch commits accumulate under
  * monotone claimed versions, pinned versions never move, replay is a
  * no-op, the maintenance verbs (delete/merge/compact/vacuum)
  * interleave with appends without resurrecting deleted rows,
  * NULL-evaluating delete predicates keep their rows (SQL DELETE
  * semantics), vacuum can never destroy the current snapshot, DESCRIBE
  * HISTORY labels every commit with its operation, and CONCURRENT
  * writers (appends racing compaction/delete) serialize through the
  * claim CAS with every committed version consistent. */
class StreamingSnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("commits, pinning, replay, maintenance verbs, and their interleave") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("snapstore").toString

    val b1 = Seq((1L, "en"), (2L, "de"))
    val b2 = Seq((3L, "en"), (4L, "fr"))
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "lang").writeStream
      .foreachBatch(SnapshotStore.appendWriter(dir))
      .start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      val v1 = SnapshotStore.read(spark, dir).get
        .as[(Long, String)].collect().toSet
      assert(v1 === b1.toSet)

      input.addData(b2: _*); q.processAllAvailable()
      // newest sees both batches; version 1 stays pinned to batch 1
      val newest = SnapshotStore.read(spark, dir).get
        .as[(Long, String)].collect().toSet
      assert(newest === (b1 ++ b2).toSet)
      val pinned = SnapshotStore.read(spark, dir, version = Some(1L)).get
        .as[(Long, String)].collect().toSet
      assert(pinned === b1.toSet, "v1 reader saw a later append")
    } finally q.stop()

    // replay batch 1 (retry semantics): its marker exists, so the commit
    // is a NO-OP — no new version, no content change
    SnapshotStore.appendWriter(dir)(b2.toDF("doc_id", "lang"), 1L)
    val after = SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(after === (b1 ++ b2).toSet, "replayed batch changed the table")
    assert(SnapshotStore.manifest(spark, dir, version = Some(3L)).isEmpty,
      "replayed batch committed a new version")
    val m = SnapshotStore.manifest(spark, dir).get.as[String].collect()
    assert(m.distinct.length === m.length)

    // incremental consumption: the v1→newest delta is exactly batch 2
    val delta = SnapshotStore.changes(spark, dir, fromVersion = 1L).get
      .as[(Long, String)].collect().toSet
    assert(delta === b2.toSet, "manifest diff read more than the delta")
    assert(SnapshotStore.changes(spark, dir, fromVersion = 2L).isEmpty,
      "delta from the newest version must be empty")

    // copy-on-write delete: only files containing matches rewrite, the
    // rest keep their paths; previous versions still read their bytes
    val before = SnapshotStore.manifest(spark, dir).get
      .as[String].collect().toSet
    val (vDel, rewritten) = SnapshotStore.deleteWhere(spark, dir,
      col("lang") === "fr")
    assert(vDel === 3L, s"delete claimed version $vDel, expected 3")
    assert(rewritten >= 1)
    val afterDel = SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(afterDel === (b1 ++ b2).filterNot(_._2 == "fr").toSet)
    val mNew = SnapshotStore.manifest(spark, dir).get
      .as[String].collect().toSet
    assert((mNew -- before).nonEmpty, "delete produced no rewritten files")
    assert((mNew & before).nonEmpty, "delete rewrote untouched files")
    // time travel across the delete: the pre-delete version is intact
    val preDelete = SnapshotStore.read(spark, dir, version = Some(2L)).get
      .as[(Long, String)].collect().toSet
    assert(preDelete === (b1 ++ b2).toSet, "delete damaged a pinned version")

    // a NEW streaming batch arriving AFTER the delete chains from the
    // post-delete manifest — the deleted row must NOT resurrect
    val b3 = Seq((7L, "es"))
    SnapshotStore.appendWriter(dir)(b3.toDF("doc_id", "lang"), 2L)
    val afterAppend = SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(afterAppend === afterDel ++ b3.toSet,
      "post-delete append resurrected deleted rows or lost the delete")

    // compaction: content identical, file count drops to the target
    val vComp = SnapshotStore.compact(spark, dir, targetFiles = 1)
    assert(vComp === 5L, s"compact claimed version $vComp, expected 5")
    val afterComp = SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(afterComp === afterAppend, "compaction changed row content")
    val mComp = SnapshotStore.manifest(spark, dir).get.as[String].collect()
    assert(mComp.length === 1, s"expected 1 compacted file, got ${mComp.length}")

    // MERGE: doc 1 changes lang, doc 9 is new — one commit, upsert result
    val changes = Seq((1L, "it"), (9L, "pt")).toDF("doc_id", "lang")
    val (vMerge, rewrote) = SnapshotStore.merge(spark, dir, changes, "doc_id")
    assert(vMerge === 6L, s"merge claimed version $vMerge, expected 6")
    assert(rewrote === 1, s"expected the single compacted file rewritten, got $rewrote")
    val afterMerge = SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(afterMerge ===
      (afterComp.filterNot(_._1 == 1L) ++ Set((1L, "it"), (9L, "pt"))))
    // pre-merge version still pinned
    assert(SnapshotStore.read(spark, dir, version = Some(5L)).get
      .as[(Long, String)].collect().toSet === afterComp)

    // DESCRIBE HISTORY before vacuum: the FULL verb sequence, each
    // version labeled with its operation
    val opsBefore = SnapshotStore.history(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(opsBefore === Map(1L -> "append", 2L -> "append", 3L -> "delete",
      4L -> "append", 5L -> "compact", 6L -> "merge"),
      s"history operation labels wrong: $opsBefore")

    // VACUUM: a retainFrom beyond the newest version must refuse rather
    // than delete the current snapshot
    intercept[IllegalArgumentException] {
      SnapshotStore.vacuum(spark, dir, retainFrom = 99999L)
    }
    // legitimate vacuum: retain from the compaction; older versions'
    // exclusive files die, retained versions stay byte-identical
    val removed = SnapshotStore.vacuum(spark, dir, retainFrom = 5L)
    assert(removed >= 1, s"vacuum removed nothing")
    assert(SnapshotStore.read(spark, dir, version = Some(5L)).get
      .as[(Long, String)].collect().toSet === afterComp,
      "vacuum damaged a retained version")
    assert(SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet === afterMerge,
      "vacuum damaged the newest version")
    assert(SnapshotStore.manifest(spark, dir, version = Some(1L)).isEmpty,
      "vacuum left an expired manifest")

    // DESCRIBE HISTORY after vacuum: surviving versions only, file
    // counts match the manifests, bytes positive for live files
    val hist = SnapshotStore.history(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(hist.map(_._1).toSet === Set(5L, 6L),
      s"history versions wrong: ${hist.toSeq}")
    val h6 = hist.find(_._1 == 6L).get
    val mFiles = SnapshotStore.manifest(spark, dir).get.count()
    assert(h6._2 === "merge" && h6._3 === mFiles && h6._4 > 0L,
      s"history row for the merge commit wrong: $h6 (manifest $mFiles)")
  }

  test("a mid-stream added column surfaces on read (mergeSchema), null for old rows") {
    val dir = java.nio.file.Files.createTempDirectory("snapevo").toString
    SnapshotStore.appendWriter(dir)(Seq((1L, "en")).toDF("id", "lang"), 0L)
    SnapshotStore.appendWriter(dir)(
      Seq((2L, "de", 0.9)).toDF("id", "lang", "quality"), 1L)
    val rows = SnapshotStore.read(spark, dir).get
      .select(col("id"), col("quality")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows === Map(1L -> None, 2L -> Some(0.9)),
      s"schema-evolved read wrong: $rows")
  }

  test("deleteWhere rewrites ONLY the files that contain matches (multi-file commit)") {
    val dir = java.nio.file.Files.createTempDirectory("snapmulti").toString
    // one commit, 4 files, ids partitioned so matches live in ONE file
    val df = spark.range(0, 400)
      .selectExpr("id", "CAST(id % 4 AS INT) AS bucket")
      .repartitionByRange(4, col("bucket"))
    SnapshotStore.appendWriter(dir)(df, 0L)
    val files0 = SnapshotStore.manifest(spark, dir).get.as[String].collect().toSet
    assert(files0.size >= 4, s"expected >=4 files, got ${files0.size}")
    val (_, rewritten) = SnapshotStore.deleteWhere(spark, dir,
      col("bucket") === 2)
    assert(rewritten < files0.size, // matching file(s) only, never the table
      s"delete rewrote $rewritten of ${files0.size} files")
    val files1 = SnapshotStore.manifest(spark, dir).get.as[String].collect().toSet
    assert((files0 & files1).size == files0.size - rewritten,
      "untouched files did not keep their paths")
    assert(SnapshotStore.read(spark, dir).get
      .filter(col("bucket") === 2).count() === 0L)
    assert(SnapshotStore.read(spark, dir).get.count() === 300L)
  }

  test("deleteWhere keeps NULL-evaluating rows (SQL DELETE semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("snapnull").toString
    val rows = Seq((1L, Some(10.0)), (2L, None), (3L, Some(3.0)))
    SnapshotStore.appendWriter(dir)(
      rows.toDF("id", "score"), 0L)
    // score > 5 matches row 1; row 2's predicate is NULL and must SURVIVE
    // even though it shares a file with a matching row
    SnapshotStore.deleteWhere(spark, dir, col("score") > 5.0)
    val kept = SnapshotStore.read(spark, dir).get
      .select(col("id")).as[Long].collect().toSet
    assert(kept === Set(2L, 3L),
      s"NULL-predicate row dropped (or wrong rows deleted): kept $kept")
  }

  test("changes(appendsOnly) sees appended batches only; default re-surfaces rewrite survivors") {
    val dir = java.nio.file.Files.createTempDirectory("snapchg").toString
    // one file holding BOTH a doomed and a surviving row, so the
    // delete's rewrite deterministically carries a survivor
    SnapshotStore.appendWriter(dir)(
      Seq((1L, "keep"), (2L, "drop")).toDF("id", "tag").coalesce(1), 0L)
    SnapshotStore.deleteWhere(spark, dir, col("tag") === "drop") // v2
    SnapshotStore.appendWriter(dir)(
      Seq((3L, "new")).toDF("id", "tag").coalesce(1), 1L) // v3
    // default diff from v1: the rewrite re-surfaces its SURVIVOR (the
    // documented per-file-consumer semantics) plus the new batch
    val deflt = SnapshotStore.changes(spark, dir, fromVersion = 1L).get
      .as[(Long, String)].collect().toSet
    assert(deflt === Set((1L, "keep"), (3L, "new")),
      s"default changes() should re-surface rewrite survivors: $deflt")
    // appendsOnly: exactly-once append consumption — the rewrite is
    // invisible, only batch 1's rows appear
    val appOnly = SnapshotStore.changes(spark, dir, fromVersion = 1L,
      appendsOnly = true).get.as[(Long, String)].collect().toSet
    assert(appOnly === Set((3L, "new")),
      s"appendsOnly changes() leaked rewrite rows: $appOnly")
  }

  test("concurrent writers: appends race compact and delete, every version consistent") {
    val dir = java.nio.file.Files.createTempDirectory("snapconc").toString
    // seed rows the racing delete will remove — negative ids, disjoint
    // from every appended id so resurrection is detectable
    SnapshotStore.appendWriter(dir)(Seq(-1L, -2L, -3L).toDF("id"), 0L)

    val appendIds = (1 to 8).map(b => b.toLong -> Seq(b * 10L, b * 10L + 1))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => try {
      appendIds.foreach { case (b, ids) =>
        SnapshotStore.appendWriter(dir)(ids.toDF("id"), b)
      }
    } catch { case t: Throwable => errors.add(t) })
    val maintainer = new Thread(() => try {
      SnapshotStore.compact(spark, dir, targetFiles = 1)
      SnapshotStore.deleteWhere(spark, dir, col("id") < 0L)
      SnapshotStore.compact(spark, dir, targetFiles = 2)
    } catch { case t: Throwable => errors.add(t) })
    appender.start(); maintainer.start()
    appender.join(120000); maintainer.join(120000)
    assert(errors.isEmpty, s"concurrent writer failed: ${errors.peek()}")

    // final content: every appended id present exactly once, no
    // resurrection of the deleted negatives
    val finalIds = SnapshotStore.read(spark, dir).get
      .as[Long].collect().sorted.toSeq
    assert(finalIds === appendIds.flatMap(_._2).sorted,
      s"lost update or resurrection: $finalIds")

    // versions are contiguous (the CAS never skips or double-assigns)
    // and EVERY committed version satisfies its operation's invariant
    // against its predecessor — the serializability proof
    val hist = SnapshotStore.history(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    assert(hist.map(_._1).toSeq === (1L to hist.length.toLong),
      s"version gap: ${hist.toSeq}")
    def rowsAt(v: Long): Seq[Long] =
      SnapshotStore.read(spark, dir, Some(v)).get.as[Long].collect().sorted.toSeq
    hist.sliding(2).foreach {
      case Array((pv, _), (v, op)) =>
        val prev = rowsAt(pv); val cur = rowsAt(v)
        op match {
          case "append" =>
            assert(cur.size === prev.size + 2 &&
              prev.forall(cur.toSet), s"append v$v inconsistent vs v$pv")
          case "delete" =>
            assert(cur === prev.filter(_ >= 0L), s"delete v$v inconsistent vs v$pv")
          case "compact" =>
            assert(cur === prev, s"compact v$v changed content vs v$pv")
          case other => fail(s"unexpected operation label '$other' at v$v")
        }
      case _ => ()
    }
  }

  test("releaseClaim refuses committed versions, frees an orphaned claim") {
    val dir = java.nio.file.Files.createTempDirectory("snapclaim").toString
    SnapshotStore.appendWriter(dir)(Seq(1L).toDF("id"), 0L)
    intercept[IllegalArgumentException] {
      SnapshotStore.releaseClaim(spark, dir, 1L)
    }
    // fabricate a crashed writer's orphan claim on version 2, then show
    // a live writer times out against it and recovers after release
    val claim = new org.apache.hadoop.fs.Path(s"$dir/manifest/v2.claim")
    val fs = claim.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(claim, false)
    out.write("dead-writer".getBytes("UTF-8")); out.close()
    val e = intercept[RuntimeException] {
      graft.streaming.SnapshotStore.commitVersion(spark, dir,
        op = "compact", token = "probe", waitMs = 300L) { (prev, _) => prev.get }
    }
    assert(e.getMessage.contains("releaseClaim") &&
      e.getMessage.contains("dead-writer"),
      s"timeout did not name the orphan: ${e.getMessage}")
    assert(SnapshotStore.releaseClaim(spark, dir, 2L))
    val v = SnapshotStore.compact(spark, dir, targetFiles = 1)
    assert(v === 2L, s"released version not re-claimable: got $v")
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.SnapshotStore

/** The stream-driven snapshot table: per-batch commits accumulate under
  * monotone versions, pinned versions never move, replay is a no-op,
  * the maintenance verbs (delete/merge/compact/vacuum) interleave with
  * appends without resurrecting deleted rows, NULL-evaluating delete
  * predicates keep their rows (SQL DELETE semantics), and vacuum can
  * never destroy the current snapshot. */
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
    val rewritten = SnapshotStore.deleteWhere(spark, dir,
      col("lang") === "fr", newVersion = 1000L)
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
    SnapshotStore.compact(spark, dir, targetFiles = 1, newVersion = 1002L)
    val afterComp = SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(afterComp === afterAppend, "compaction changed row content")
    val mComp = SnapshotStore.manifest(spark, dir).get.as[String].collect()
    assert(mComp.length === 1, s"expected 1 compacted file, got ${mComp.length}")

    // MERGE: doc 1 changes lang, doc 9 is new — one commit, upsert result
    val changes = Seq((1L, "it"), (9L, "pt")).toDF("doc_id", "lang")
    val rewrote = SnapshotStore.merge(spark, dir, changes, "doc_id", 1003L)
    assert(rewrote === 1, s"expected the single compacted file rewritten, got $rewrote")
    val afterMerge = SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(afterMerge ===
      (afterComp.filterNot(_._1 == 1L) ++ Set((1L, "it"), (9L, "pt"))))
    // pre-merge version still pinned
    assert(SnapshotStore.read(spark, dir, version = Some(1002L)).get
      .as[(Long, String)].collect().toSet === afterComp)

    // VACUUM: a retainFrom beyond the newest version must refuse rather
    // than delete the current snapshot
    intercept[IllegalArgumentException] {
      SnapshotStore.vacuum(spark, dir, retainFrom = 99999L)
    }
    // legitimate vacuum: retain from the compaction; older versions'
    // exclusive files die, retained versions stay byte-identical
    val removed = SnapshotStore.vacuum(spark, dir, retainFrom = 1002L)
    assert(removed >= 1, s"vacuum removed nothing")
    assert(SnapshotStore.read(spark, dir, version = Some(1002L)).get
      .as[(Long, String)].collect().toSet === afterComp,
      "vacuum damaged a retained version")
    assert(SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet === afterMerge,
      "vacuum damaged the newest version")
    assert(SnapshotStore.manifest(spark, dir, version = Some(1L)).isEmpty,
      "vacuum left an expired manifest")

    // DESCRIBE HISTORY: surviving versions only, file counts match the
    // manifests, bytes positive for live files
    val hist = SnapshotStore.history(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hist.map(_._1).toSet === Set(1002L, 1003L),
      s"history versions wrong: ${hist.toSeq}")
    val h1003 = hist.find(_._1 == 1003L).get
    val mFiles = SnapshotStore.manifest(spark, dir).get.count()
    assert(h1003._2 === mFiles && h1003._3 > 0L,
      s"history row for the merge commit wrong: $h1003 (manifest $mFiles)")
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
    val rewritten = SnapshotStore.deleteWhere(spark, dir,
      col("bucket") === 2, newVersion = 10L)
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
    SnapshotStore.deleteWhere(spark, dir, col("score") > 5.0, 100L)
    val kept = SnapshotStore.read(spark, dir).get
      .select(col("id")).as[Long].collect().toSet
    assert(kept === Set(2L, 3L),
      s"NULL-predicate row dropped (or wrong rows deleted): kept $kept")
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SnapshotStore

/** The stream-driven snapshot table: every micro-batch commits a new
  * manifest version, old versions stay readable and pinned (snapshot
  * isolation under continuous ingest), and a replayed batch re-lands the
  * identical commit instead of appending twice. */
class StreamingSnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch commits accumulate; pinned versions never move; replay is idempotent") {
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
      val v0 = SnapshotStore.read(spark, dir).get
        .as[(Long, String)].collect().toSet
      assert(v0 === b1.toSet)

      input.addData(b2: _*); q.processAllAvailable()
      // newest sees both batches; version 0 stays pinned to batch 1
      val newest = SnapshotStore.read(spark, dir).get
        .as[(Long, String)].collect().toSet
      assert(newest === (b1 ++ b2).toSet)
      val pinned = SnapshotStore.read(spark, dir, version = Some(0L)).get
        .as[(Long, String)].collect().toSet
      assert(pinned === b1.toSet, "v0 reader saw a later append")
    } finally q.stop()

    // replay batch 1 (retry semantics): same id, same data — the commit
    // must re-land identically, not double-append
    SnapshotStore.appendWriter(dir)(b2.toDF("doc_id", "lang"), 1L)
    val after = SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(after === (b1 ++ b2).toSet, "replayed batch double-appended")
    // manifest row count: 1 file list entry per data file, no duplicates
    val m = SnapshotStore.manifest(spark, dir).get.as[String].collect()
    assert(m.distinct.length === m.length)

    // incremental consumption: the v0→v1 delta is exactly batch 2, planned
    // from the manifest diff (delta-only files — never the base table)
    val delta = SnapshotStore.changes(spark, dir, fromVersion = 0L).get
      .as[(Long, String)].collect().toSet
    assert(delta === b2.toSet, "manifest diff read more than the delta")
    assert(SnapshotStore.changes(spark, dir, fromVersion = 1L).isEmpty,
      "delta from the newest version must be empty")

    // copy-on-write delete: only files containing matches rewrite, the
    // rest keep their paths; previous versions still read their bytes
    import org.apache.spark.sql.functions.col
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
    val preDelete = SnapshotStore.read(spark, dir, version = Some(1L)).get
      .as[(Long, String)].collect().toSet
    assert(preDelete === (b1 ++ b2).toSet, "delete damaged a pinned version")

    // compaction: content identical, file count drops to the target
    SnapshotStore.compact(spark, dir, targetFiles = 1, newVersion = 1001L)
    val afterComp = SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(afterComp === afterDel, "compaction changed row content")
    val mComp = SnapshotStore.manifest(spark, dir).get.as[String].collect()
    assert(mComp.length === 1, s"expected 1 compacted file, got ${mComp.length}")

    // MERGE: doc 1 changes lang, doc 9 is new — one commit, upsert result
    val changes = Seq((1L, "it"), (9L, "pt")).toDF("doc_id", "lang")
    val rewrote = SnapshotStore.merge(spark, dir, changes, "doc_id", 1002L)
    assert(rewrote === 1, s"expected the single compacted file rewritten, got $rewrote")
    val afterMerge = SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(afterMerge ===
      (afterComp.filterNot(_._1 == 1L) ++ Set((1L, "it"), (9L, "pt"))))
    // pre-merge version still pinned
    assert(SnapshotStore.read(spark, dir, version = Some(1001L)).get
      .as[(Long, String)].collect().toSet === afterComp)

    // VACUUM: retain from the compaction; older versions' exclusive
    // files die, retained versions stay byte-identical readable
    val removed = SnapshotStore.vacuum(spark, dir, retainFrom = 1001L)
    assert(removed >= 1, s"vacuum removed nothing")
    assert(SnapshotStore.read(spark, dir, version = Some(1001L)).get
      .as[(Long, String)].collect().toSet === afterComp,
      "vacuum damaged a retained version")
    assert(SnapshotStore.read(spark, dir).get
      .as[(Long, String)].collect().toSet === afterMerge,
      "vacuum damaged the newest version")
    assert(SnapshotStore.manifest(spark, dir, version = Some(0L)).isEmpty,
      "vacuum left an expired manifest")
  }
}

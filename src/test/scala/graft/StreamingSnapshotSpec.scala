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
  }
}

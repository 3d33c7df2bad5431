package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.api.Corpus
import graft.streaming.IndexMaintenance

/** The stream-driven index-maintenance leg: a document stream folded into
  * the persisted (minhash index, hot census) pair via foreachBatch equals
  * the from-scratch batch build over the same delivered documents after
  * EVERY prefix of batches — and a bucket tombstoned mid-stream never
  * resurrects, no matter what later batches add to it. */
class StreamingIndexMergeSpec extends SparkSpec {
  import spark.implicits._

  private val Cap = 2

  /** Canonical sortable census of an index / hot-census frame pair. */
  private def censusOf(idx: DataFrame, hot: DataFrame) = (
    idx.orderBy("band", "x", "y", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq,
    hot.orderBy("band", "x", "y").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq)

  test("stream merge equals batch rebuild after every batch; no resurrection") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("idxstream").toString

    // identical texts collide in every band: three copies cross Cap=2
    // at batch 2 (tombstone), batch 3 adds a fourth copy to the SAME
    // buckets plus fresh docs
    val hotText = (1 to 12).map(i => s"boiler$i").mkString(" ")
    def fresh(i: Long) = (1 to 12).map(j => s"doc${i}tok$j").mkString(" ")
    val batches = Seq(
      Seq((1L, hotText), (2L, fresh(2))),
      Seq((3L, hotText), (4L, hotText), (5L, fresh(5))),
      Seq((6L, hotText), (7L, fresh(7))))

    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(IndexMaintenance.minhashMerger(dir, bucketCap = Cap))
      .start()
    try {
      var delivered = Seq.empty[(Long, String)]
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
        delivered ++= b
        val Some((idx, hot)) = IndexMaintenance.latest(spark, dir)
        val all = delivered.toDF("doc_id", "text")
        val rebuilt = censusOf(
          Corpus.minhashIndex(all, bucketCap = Cap),
          Corpus.minhashHotCensus(all, bucketCap = Cap))
        assert(censusOf(idx, hot) === rebuilt,
          s"stream state diverged from rebuild after ${delivered.size} docs")
      }
      // no resurrection: the hotText buckets crossed the cap at batch 2;
      // batch 3's copy (doc 6) must appear in NO index row
      val Some((idx, hot)) = IndexMaintenance.latest(spark, dir)
      assert(idx.filter($"doc_id".isin(1L, 3L, 4L, 6L)).count() === 0L,
        "tombstoned bucket resurrected in the index")
      // and the census carries the full 4-copy count for those buckets
      assert(hot.agg(org.apache.spark.sql.functions.max($"bucket_n"))
        .head().getLong(0) === 4L)
      // the served-index leg works off the read-back state
      val cands = Corpus.dedupAgainstIndex(idx,
        Seq((100L, fresh(7))).toDF("doc_id", "text"))
      assert(cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        === Set((7L, 100L)))
    } finally q.stop()
  }

  test("a replayed batch id overwrites its version instead of double-merging") {
    val dir = java.nio.file.Files.createTempDirectory("idxreplay").toString
    val merger = IndexMaintenance.minhashMerger(dir, bucketCap = Cap)
    val b1 = Seq((1L, (1 to 12).map(i => s"a$i").mkString(" ")))
      .toDF("doc_id", "text")
    merger(b1, 0L)
    val once = censusOf(IndexMaintenance.latest(spark, dir).get._1,
      IndexMaintenance.latest(spark, dir).get._2)
    merger(b1, 0L) // foreachBatch retry: same batch id, same data
    val twice = censusOf(IndexMaintenance.latest(spark, dir).get._1,
      IndexMaintenance.latest(spark, dir).get._2)
    assert(twice === once, "replayed batch double-merged")
  }

  test("prune keeps the newest versions and latest() still serves") {
    val dir = java.nio.file.Files.createTempDirectory("idxprune").toString
    val merger = IndexMaintenance.minhashMerger(dir, bucketCap = Cap)
    (0 until 3).foreach { i =>
      merger(Seq((i.toLong, (1 to 12).map(j => s"p${i}w$j").mkString(" ")))
        .toDF("doc_id", "text"), i.toLong)
    }
    val before = censusOf(IndexMaintenance.latest(spark, dir).get._1,
      IndexMaintenance.latest(spark, dir).get._2)
    val removed = IndexMaintenance.prune(spark, dir, keep = 2)
    assert(removed === 2) // 1 stale version x 2 legs
    assert(censusOf(IndexMaintenance.latest(spark, dir).get._1,
      IndexMaintenance.latest(spark, dir).get._2) === before)
    assert(IndexMaintenance.prune(spark, dir, keep = 2) === 0)
    // keep=1 is refused: a replay reads the version below its own, so a
    // single retained version could silently reset the index
    intercept[IllegalArgumentException] {
      IndexMaintenance.prune(spark, dir, keep = 1)
    }
  }

  test("a half-written version (one leg only) is skipped by readers") {
    val dir = java.nio.file.Files.createTempDirectory("idxhalf").toString
    val merger = IndexMaintenance.minhashMerger(dir, bucketCap = Cap)
    merger(Seq((1L, (1 to 12).map(i => s"h$i").mkString(" ")))
      .toDF("doc_id", "text"), 0L)
    val good = censusOf(IndexMaintenance.latest(spark, dir).get._1,
      IndexMaintenance.latest(spark, dir).get._2)
    // simulate a crash between the two leg writes of batch 1
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "idx", "v1"))
    assert(censusOf(IndexMaintenance.latest(spark, dir).get._1,
      IndexMaintenance.latest(spark, dir).get._2) === good)
  }

  test("latest() is None before any batch commits") {
    val dir = java.nio.file.Files.createTempDirectory("idxempty").toString
    assert(IndexMaintenance.latest(spark, dir).isEmpty)
  }
}

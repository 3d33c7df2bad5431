package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.RealCodec

/** Streaming media ingest: REAL decode + dHash inside the stream, then
  * watermarked keep-first per perceptual fingerprint — a re-crawled or
  * re-encoded copy arriving in a later micro-batch is suppressed before
  * reaching the corpus, state bounded by the watermark horizon.
  *
  * Fixture law: ids congruent mod lcm(9,7,256) = 16128 render the SAME
  * pixels (dims come from id mod 9/7, the gray law from id mod 256), so
  * id and id+16128 are genuine perceptual duplicates with different ids.
  */
class StreamingMediaSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("in-stream decode + perceptual dedup suppresses dupes across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // sanity of the fixture law, decoded for real
    val fpOf = (id: Long) => RealCodec.dHash(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(RealCodec.encodeImage(
        RealCodec.renderGray(id, (id % 9 + 8).toInt, (id % 7 + 8).toInt), "png"))))
    assert(fpOf(5L) == fpOf(5L + 16128L), "fixture ids must collide")
    assert(fpOf(5L) != fpOf(6L), "distinct fixture ids must not collide")

    val input = MemoryStream[(Long, Int, Int, Timestamp)]
    val out = RealCodec.fingerprintStream(
      input.toDF().toDF("media_id", "w", "h", "ts"), "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("media_fp_test").outputMode("append").start()
    try {
      def spec(id: Long, min: Long) =
        (id, (id % 9 + 8).toInt, (id % 7 + 8).toInt, ts(min))
      // batch 1: two distinct images + one same-batch perceptual dup
      input.addData(spec(5L, 0), spec(6L, 1), spec(5L + 16128L, 2))
      q.processAllAvailable()
      val first = spark.table("media_fp_test")
        .select("media_id").collect().map(_.getLong(0)).toSet
      assert(first.size == 2 && first.contains(6L),
        s"one row per fingerprint expected, got $first")
      assert(first.intersect(Set(5L, 5L + 16128L)).size == 1,
        "exactly one of the perceptual twins survives")

      // batch 2: a later re-crawl of image 5 (next replica id), still
      // inside the watermark — suppressed
      input.addData(spec(5L + 2 * 16128L, 3))
      q.processAllAvailable()
      assert(spark.table("media_fp_test").count() == 2,
        "re-crawled copy within the watermark must not re-emit")

      // batch 3: POISON records ride along with a genuinely new image —
      // w=0 (the degenerate raster) AND w=h=50000 (a multi-GB raster
      // that would OOM renderGray, the oversized-spec door). Both must
      // be quarantined by the pre-decode filter, not crash the query (a
      // throw would crash-loop: restart replays the same micro-batch)
      input.addData((99L, 0, 10, ts(4)), (98L, 50000, 50000, ts(4)),
        spec(7L, 4))
      q.processAllAvailable()
      assert(spark.table("media_fp_test").count() == 3)
      assert(spark.table("media_fp_test")
        .filter($"media_id".isin(99L, 98L)).count() == 0,
        "poison record leaked")
      // and the emitted fingerprints are the decoded-raster truth
      val fps = spark.table("media_fp_test")
        .select("media_id", "fp").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      fps.foreach { case (id, fp) => assert(fp == fpOf(id)) }
    } finally q.stop()
  }
}

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

  test("audio stream: RIFF parse + contour dedup suppresses dupes, quarantines poison") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // twin law: the sample law runs mod 65536 in media_id, so id and
    // id + 65536 with the same (n, rate) produce identical PCM
    val fpOf = (id: Long, n: Int) =>
      RealCodec.audioFingerprint(RealCodec.encodeWav(id, n, 16000))
    assert(fpOf(9L, 200) == fpOf(9L + 65536L, 200), "twin ids must collide")
    assert(fpOf(9L, 200) != fpOf(10L, 200))

    val input = MemoryStream[(Long, Int, Int, Timestamp)]
    val out = RealCodec.audioFingerprintStream(
      input.toDF().toDF("media_id", "n", "rate", "ts"), "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("audio_fp_test").outputMode("append").start()
    try {
      // minute 1, not 0: Spark's initial watermark is epoch 0, and a
      // dropDuplicatesWithinWatermark row at exactly event-time 0 is
      // born expired and silently dropped
      input.addData((9L, 200, 16000, ts(1)), (10L, 200, 16000, ts(2)))
      q.processAllAvailable()
      assert(spark.table("audio_fp_test").count() == 2)
      // batch 2: a re-encoded twin + two poison records (n=0 and an
      // oversized n that would allocate a multi-GB PCM buffer)
      input.addData((9L + 65536L, 200, 16000, ts(3)),
        (66L, 0, 16000, ts(3)), (67L, Int.MaxValue, 16000, ts(3)),
        (68L, 100, 2000000000, ts(3))) // rate past MaxStreamRate:
      // encodeWav's byte-rate field (rate*2) would overflow Int
      q.processAllAvailable()
      assert(spark.table("audio_fp_test").count() == 2,
        "twin must be suppressed, poison quarantined")
      assert(spark.table("audio_fp_test")
        .filter($"media_id".isin(66L, 67L, 68L)).count() == 0)
    } finally q.stop()
  }

  test("video stream: AVI walk + per-frame dedup suppresses shared frames across clips") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Int, Int, Int, Timestamp)]
    val out = graft.operators.VideoCodec.fingerprintStream(
      input.toDF().toDF("media_id", "w", "h", "nf", "ts"), "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("video_fp_test").outputMode("append").start()
    // the law, driver-side: expected per-frame fingerprints (the stream
    // decodes through AVI+BMP, but DIB is lossless so dHash of the
    // rendered raster IS the decoded truth)
    def clipFps(id: Long, w: Int, h: Int, nf: Int): Set[Long] =
      (0 until nf).map(f => RealCodec.dHash(
        RealCodec.renderGray(graft.operators.VideoCodec.frameSeed(id, f), w, h))).toSet
    val fps5 = clipFps(5L, 10, 9, 3)
    val fps6 = clipFps(6L, 12, 11, 2)
    assert(clipFps(5L + 16128L, 10, 9, 3) == fps5,
      "twin clip must share every frame fingerprint")
    assert((fps6 -- fps5).nonEmpty, "fixture clip 6 must bring new frames")
    try {
      input.addData((5L, 10, 9, 3, ts(1))) // minute 1: epoch 0 is born-expired
      q.processAllAvailable()
      assert(spark.table("video_fp_test").count() == fps5.size,
        "one row per distinct frame fingerprint")
      // a re-post of the whole clip (frame seeds differ by 16128 ≡ 0
      // mod 256 → every frame a perceptual twin) + a poison record
      input.addData((5L + 16128L, 10, 9, 3, ts(2)),
        (77L, 50000, 50000, 4, ts(2)), // poison: w·h·nf over budget
        (78L, 1, 1, 50000, ts(2))) // poison: nf bomb — tiny pixels but
      // 50k container chunks + BMP decodes, caught by the nf cap alone
      q.processAllAvailable()
      assert(spark.table("video_fp_test").count() == fps5.size,
        "re-posted clip's frames must all be suppressed")
      assert(spark.table("video_fp_test")
        .filter($"media_id".isin(77L, 78L)).count() == 0, "poison leaked")
      // a genuinely new clip passes exactly its novel fingerprints
      input.addData((6L, 12, 11, 2, ts(3)))
      q.processAllAvailable()
      assert(spark.table("video_fp_test").count() == (fps5 ++ fps6).size)
    } finally q.stop()
  }
}

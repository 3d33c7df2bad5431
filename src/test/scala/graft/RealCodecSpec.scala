package graft

import graft.operators.RealCodec

/** The REAL codec paths: JDK ImageIO (PNG/BMP/GIF/JPEG) and the RIFF/WAVE
  * chunk walker. The pixel/sample laws have closed forms, so round-trip
  * exactness is asserted value-by-value here and re-proven against DuckDB
  * arithmetic by the q_image_decode / q_audio_decode oracles. */
class RealCodecSpec extends SparkSpec {

  // ------------------------------------------------------------- images

  test("PNG encode→decode round-trips every pixel of the gray law") {
    // drive-range media_id included: the law must hold past 2^31
    for (id <- Seq(0L, 7L, 499L, 2_200_000_123L); (w, h) <- Seq((8, 14), (16, 8))) {
      val bytes = RealCodec.encodeImage(RealCodec.renderGray(id, w, h), "png")
      // real compressed PNG, not a raw dump: magic + smaller-than-raster
      assert((bytes(1) & 0xff) == 'P' && (bytes(2) & 0xff) == 'N')
      val d = RealCodec.decodeImage(bytes)
      assert(d.width == w && d.height == h)
      var sum = 0L; var mn = 256; var mx = -1
      for (i <- 0 until h; j <- 0 until w) {
        val p = RealCodec.grayAt(id, i, j)
        sum += p; mn = math.min(mn, p); mx = math.max(mx, p)
      }
      assert(d.lumSum == sum && d.lumMin == mn && d.lumMax == mx,
        s"PNG round-trip drifted for id=$id ${w}x$h")
    }
  }

  test("BMP and GIF round-trip the same raster (multi-codec, one decoder)") {
    val img = RealCodec.renderGray(42L, 12, 9)
    val png = RealCodec.decodeImage(RealCodec.encodeImage(img, "png"))
    for (fmt <- Seq("bmp", "gif")) {
      val d = RealCodec.decodeImage(RealCodec.encodeImage(img, fmt))
      assert(d == png, s"$fmt decode disagrees with png decode")
    }
  }

  test("JPEG decodes with correct dimensions (lossy: stats off-grid is expected)") {
    val bytes = RealCodec.encodeImage(RealCodec.renderGray(7L, 16, 10), "jpg")
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "JFIF magic")
    val d = RealCodec.decodeImage(bytes)
    assert(d.width == 16 && d.height == 10)
    assert(d.lumMin >= 0 && d.lumMax <= 255)
  }

  test("raster resize matches the law at the resampled indices, both directions") {
    for (id <- Seq(3L, 2_200_000_123L); (w, h) <- Seq((8, 14), (16, 8));
         (ow, oh) <- Seq((12, 10), (4, 4), (20, 20))) {
      val r = RealCodec.resizeImage(RealCodec.renderGray(id, w, h), ow, oh)
      assert(r.getWidth == ow && r.getHeight == oh)
      for (i <- 0 until oh; j <- 0 until ow)
        assert(r.getRaster.getSample(j, i, 0) ==
          RealCodec.grayAt(id, i * h / oh, j * w / ow),
          s"resize drifted id=$id ${w}x$h -> ${ow}x$oh at ($i,$j)")
    }
    // the positional checksum is direction-sensitive: a transposed
    // resize of a non-square raster must not checksum-collide
    def posSum(img: java.awt.image.BufferedImage): Long = {
      var s = 0L
      for (i <- 0 until img.getHeight; j <- 0 until img.getWidth)
        s += img.getRaster.getSample(j, i, 0).toLong * (i * img.getWidth + j + 1)
      s
    }
    val src = RealCodec.renderGray(11L, 9, 13)
    assert(posSum(RealCodec.resizeImage(src, 12, 10)) !=
      posSum(RealCodec.resizeImage(src, 10, 12)))
  }

  test("laplacian sharpness: stencil matches a driver replay; flat field is zero") {
    for (id <- Seq(6L, 2_200_000_123L); (w, h) <- Seq((8, 8), (16, 14))) {
      val (n, s, sq) = RealCodec.laplacianStats(RealCodec.renderGray(id, w, h))
      var en = 0L; var es = 0L; var esq = 0L
      for (i <- 1 until h - 1; j <- 1 until w - 1) {
        val lap = 4 * RealCodec.grayAt(id, i, j) -
          RealCodec.grayAt(id, i - 1, j) - RealCodec.grayAt(id, i + 1, j) -
          RealCodec.grayAt(id, i, j - 1) - RealCodec.grayAt(id, i, j + 1)
        en += 1; es += lap; esq += lap.toLong * lap
      }
      assert((n, s, sq) == ((en, es, esq)), s"stencil drifted id=$id ${w}x$h")
    }
    // a perfectly flat (maximally blurred) raster has zero Laplacian
    // energy — the blur-detector's anchor case
    val flat = new java.awt.image.BufferedImage(10, 10,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (i <- 0 until 10; j <- 0 until 10) flat.getRaster.setSample(j, i, 0, 128)
    assert(RealCodec.laplacianStats(flat) == ((64L, 0L, 0L)))
  }

  test("augmentation permutes coordinates exactly; double-flip is identity") {
    val img = RealCodec.renderGray(23L, 11, 9)
    def px(im: java.awt.image.BufferedImage)(i: Int, j: Int) =
      im.getRaster.getSample(j, i, 0)
    val (hf, vf, r2) = (RealCodec.augmentImage(img, "hflip"),
      RealCodec.augmentImage(img, "vflip"), RealCodec.augmentImage(img, "rot180"))
    for (i <- 0 until 9; j <- 0 until 11) {
      assert(px(hf)(i, j) == px(img)(i, 10 - j))
      assert(px(vf)(i, j) == px(img)(8 - i, j))
      assert(px(r2)(i, j) == px(img)(8 - i, 10 - j))
    }
    // involution: flipping twice restores the original, pixel-exact
    val back = RealCodec.augmentImage(hf, "hflip")
    for (i <- 0 until 9; j <- 0 until 11)
      assert(px(back)(i, j) == px(img)(i, j))
    assertThrows[IllegalArgumentException] {
      RealCodec.augmentImage(img, "rot90")
    }
  }

  test("garbage and truncated image payloads fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      RealCodec.decodeImage("not an image at all".getBytes("UTF-8"))
    }
    assert(Option(e1.getMessage).exists(_.contains("no JDK codec")))
    val png = RealCodec.encodeImage(RealCodec.renderGray(1L, 8, 8), "png")
    // a PNG cut mid-IDAT: ImageIO either returns null (require fires) or
    // throws its own IIOException — either way the failure is loud
    assertThrows[Exception] {
      RealCodec.decodeImage(png.take(png.length / 2))
    }
  }

  test("dHash matches the law-resampled reference and survives re-encode") {
    for (id <- Seq(0L, 7L, 499L, 2_200_000_123L)) {
      val (w, h) = ((id % 9 + 8).toInt, (id % 7 + 8).toInt)
      val img = RealCodec.renderGray(id, w, h)
      // reference fingerprint straight from the pixel law
      var fp = 0L
      for (i <- 0 until 8; j <- 0 until 8) {
        val g0 = RealCodec.grayAt(id, i * h / 8, j * w / 9)
        val g1 = RealCodec.grayAt(id, i * h / 8, (j + 1) * w / 9)
        if (g1 > g0) fp |= (1L << (i * 8 + j))
      }
      assert(RealCodec.dHash(img) == fp, s"dHash drifted for id=$id")
      // the perceptual property: a lossless re-encode through ANOTHER
      // codec is a byte-different payload with the same fingerprint
      val viaBmp = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(RealCodec.encodeImage(img, "bmp")))
      assert(RealCodec.dHash(viaBmp) == fp, "re-encoded copy changed fingerprint")
    }
    // sub-grid rasters upsample with repeating indexes — still law-exact
    // (id=0 above already has w=8 < 9); an empty raster is refused
    val tiny = RealCodec.renderGray(3L, 2, 2)
    var tinyFp = 0L
    for (i <- 0 until 8; j <- 0 until 8) {
      val g0 = RealCodec.grayAt(3L, i * 2 / 8, j * 2 / 9)
      val g1 = RealCodec.grayAt(3L, i * 2 / 8, (j + 1) * 2 / 9)
      if (g1 > g0) tinyFp |= (1L << (i * 8 + j))
    }
    assert(RealCodec.dHash(tiny) == tinyFp)
  }

  test("q_image_dhash census matches the law re-derived in Scala") {
    val row = RealCodec.imageDHashCensus(spark, sfDir).collect()(0)
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val fps = ids.map { id =>
      val (w, h) = ((id % 9 + 8).toInt, (id % 7 + 8).toInt)
      var fp = 0L
      for (i <- 0 until 8; j <- 0 until 8) {
        val g0 = RealCodec.grayAt(id, i * h / 8, j * w / 9)
        val g1 = RealCodec.grayAt(id, i * h / 8, (j + 1) * w / 9)
        if (g1 > g0) fp |= (1L << (i * 8 + j))
      }
      id -> fp
    }
    val groups = fps.groupBy(_._2)
    def pmod(x: Long) = ((x % 1000000007L) + 1000000007L) % 1000000007L
    assert(row.getLong(0) == ids.length.toLong)
    assert(row.getLong(1) == groups.size.toLong, "n_kept drifted")
    assert(row.getLong(2) == (ids.length - groups.size).toLong)
    assert(row.getLong(3) == groups.values.map(_.length).max.toLong)
    assert(row.getLong(4) == groups.values.map(_.map(_._1).min).sum)
    assert(row.getLong(5) == groups.keys.map(pmod).sum)
  }

  // -------------------------------------------------------------- audio

  test("WAV encode→parse round-trips the sample law exactly, both tag parities") {
    // "graft:100" has even length, "graft:1001" odd — the RIFF pad-byte
    // branch runs in both states
    for (id <- Seq(100L, 1001L, 2_000_000_001L); (n, rate) <- Seq((64, 8000), (319, 16000))) {
      val d = RealCodec.decodeWav(id, RealCodec.encodeWav(id, n, rate))
      assert(d.sample_rate == rate && d.n_samples == n.toLong)
      var sum = 0L; var abs = 0L; var mn = 65536; var mx = -65536
      for (t <- 0 until n) {
        val s = RealCodec.sampleAt(id, t)
        sum += s; abs += math.abs(s); mn = math.min(mn, s); mx = math.max(mx, s)
      }
      assert(d.amp_sum == sum && d.amp_abs_sum == abs
        && d.amp_min == mn && d.amp_max == mx,
        s"WAV round-trip drifted for id=$id n=$n rate=$rate")
    }
  }

  test("PCM resample matches a driver replay: 2:1 both ways, identity, 3:1") {
    def lawSamples(id: Long, n: Int): Array[Int] =
      Array.tabulate(n)(t => RealCodec.sampleAt(id, t))
    def resampled(id: Long, n: Int, srcRate: Int, outRate: Int): Array[Int] = {
      val bytes = RealCodec.resampleWav(id,
        RealCodec.encodeWav(id, n, srcRate), outRate)
      val d = RealCodec.decodeWav(id, bytes)
      assert(d.sample_rate == outRate, "re-encoded header rate drifted")
      // the encoder writes the data chunk last, so the samples are the
      // final n_samples·2 bytes — read the VALUES, not just the stats
      val all = new Array[Int](d.n_samples.toInt)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.position(bytes.length - all.length * 2)
      var i = 0
      while (i < all.length) { all(i) = bb.getShort.toInt; i += 1 }
      all
    }
    def reference(src: Array[Int], srcRate: Int, outRate: Int): Array[Int] = {
      val n2 = ((src.length - 1).toLong * outRate / srcRate).toInt + 1
      Array.tabulate(n2) { k =>
        val num = k.toLong * srcRate
        val p = (num / outRate).toInt
        val rem = num % outRate
        if (rem == 0 || p + 1 >= src.length) src(p)
        else {
          val ua = (src(p) + 32768).toLong
          val ub = (src(p + 1) + 32768).toLong
          ((ua * (outRate - rem) + ub * rem) / outRate - 32768).toInt
        }
      }
    }
    for (id <- Seq(7L, 8L, 2_000_000_001L)) {
      val src = lawSamples(id, 100)
      // identity: same rate in and out must be byte-for-byte the samples
      assert(resampled(id, 100, 16000, 16000).toSeq == src.toSeq)
      // 2:1 down, 1:2 up, and a non-dyadic 3:1 down
      for ((r1, r2) <- Seq((16000, 8000), (8000, 16000), (48000, 16000)))
        assert(resampled(id, 100, r1, r2).toSeq ==
          reference(src, r1, r2).toSeq, s"resample drifted at $r1->$r2")
    }
  }

  test("WAV parser rejects bad magic, truncation, and non-PCM shapes loudly") {
    val good = RealCodec.encodeWav(5L, 100, 16000)
    def msg(e: Throwable) = Option(e.getMessage).getOrElse("")
    val bad = good.clone(); bad(0) = 'X'.toByte
    assert(msg(intercept[IllegalArgumentException] {
      RealCodec.decodeWav(5L, bad)
    }).contains("RIFF"))
    // truncated mid-data: RIFF length no longer matches the payload
    assert(msg(intercept[IllegalArgumentException] {
      RealCodec.decodeWav(5L, good.take(good.length - 10))
    }).contains("RIFF length"))
    // a stereo fmt chunk must be refused, not mis-summed
    val stereo = good.clone()
    stereo(22) = 2.toByte // channels field, LE lo byte
    assert(msg(intercept[IllegalArgumentException] {
      RealCodec.decodeWav(5L, stereo)
    }).contains("PCM-16 mono"))
    // a hostile chunk length near Int.MaxValue must hit the overrun
    // guard, not wrap position+len negative and sneak past it
    val hostile = good.clone()
    // 'grft' tag chunk length field sits at offset 40 (RIFF hdr 12 + fmt 24 + id 4)
    hostile(40) = 0xf0.toByte; hostile(41) = 0xff.toByte
    hostile(42) = 0xff.toByte; hostile(43) = 0x7f.toByte
    assert(msg(intercept[IllegalArgumentException] {
      RealCodec.decodeWav(5L, hostile)
    }).contains("overruns the payload"))
  }

  test("WAV parser survives a deterministic byte-flip fuzz sweep") {
    // every single-byte corruption of a valid payload must either parse
    // (flips inside PCM data or the tag just change values) or fail with
    // the parser's own IllegalArgumentException / ByteBuffer bounds
    // errors — never hang, never array-index crash, never silent zeros
    val good = RealCodec.encodeWav(77L, 120, 16000)
    var parsed = 0
    var refused = 0
    for (pos <- good.indices; delta <- Seq(1, 128)) {
      val mutant = good.clone()
      mutant(pos) = (mutant(pos) + delta).toByte
      try {
        val d = RealCodec.decodeWav(77L, mutant)
        assert(d.n_samples >= 0 && d.sample_rate > 0)
        parsed += 1
      } catch {
        case _: IllegalArgumentException => refused += 1 // require() or BB position
        case e: java.nio.BufferUnderflowException => refused += 1
      }
    }
    // data-section flips parse (240 bytes of PCM × 2 deltas dominate);
    // header flips mostly refuse — both behaviors must occur
    assert(parsed > 400 && refused > 50, s"parsed=$parsed refused=$refused")
  }

  test("q_image_dedup_serve matches the law re-derived in Scala") {
    val row = RealCodec.imageDedupServe(spark, sfDir).collect()(0)
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val hist = ids.filter(_ % 7 != 0).map(fpOf).toSet
    val batch = ids.filter(_ % 7 == 0).map(id => id -> fpOf(id))
    def pmod(x: Long) = ((x % 1000000007L) + 1000000007L) % 1000000007L
    assert(row.getLong(0) == batch.length.toLong)
    assert(row.getLong(1) == batch.count(b => hist(b._2)).toLong, "n_dups drifted")
    assert(row.getLong(2) == batch.filterNot(b => hist(b._2)).map(_._1).sum)
    assert(row.getLong(3) == batch.filterNot(b => hist(b._2)).map(b => pmod(b._2)).sum)
  }

  // ------------------------------------------- end-to-end census queries

  test("q_image_decode census matches the law re-derived in Scala") {
    val rows = RealCodec.imageDecodeStats(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // recompute from the law over the real doc_ids
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val expect = ids.groupBy(id => id % 9 + 8).map { case (w, g) =>
      val pixels = g.flatMap { id =>
        val h = (id % 7 + 8).toInt
        for (i <- 0 until h; j <- 0 until w.toInt) yield RealCodec.grayAt(id, i, j)
      }
      w -> ((g.length.toLong, g.map(id => w * (id % 7 + 8)).sum,
        pixels.map(_.toLong).sum, pixels.min.toLong, pixels.max.toLong))
    }
    assert(rows == expect, "decoded census drifted from the pixel law")
  }

  /** The dHash law re-derived arithmetically (the tests' shared truth;
    * one copy so a law change cannot leave two tests disagreeing). */
  private def fpOf(id: Long): Long = {
    val (w, h) = ((id % 9 + 8).toInt, (id % 7 + 8).toInt)
    var fp = 0L
    for (i <- 0 until 8; j <- 0 until 8) {
      val g0 = RealCodec.grayAt(id, i * h / 8, j * w / 9)
      val g1 = RealCodec.grayAt(id, i * h / 8, (j + 1) * w / 9)
      if (g1 > g0) fp |= (1L << (i * 8 + j))
    }
    fp
  }

  test("q_image_neardup banded census equals brute force over law fingerprints") {
    val row = RealCodec.imageNearDupCensus(spark, sfDir).collect()(0)
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val groups = ids.map(fpOf).groupBy(identity).map { case (fp, g) => fp -> g.length }
    val fps = groups.keys.toArray
    // brute force: EVERY distinct-fp pair, not just banded candidates —
    // a pair the banding missed would show up here as a census drift
    val pairs = for {
      ai <- fps.indices; bi <- (ai + 1) until fps.length
      a = math.min(fps(ai), fps(bi)); b = math.max(fps(ai), fps(bi))
      hamming = java.lang.Long.bitCount(a ^ b)
      if hamming >= 1 && hamming <= 3
    } yield (a, b, hamming)
    def pmod(x: Long) = ((x % 1000000007L) + 1000000007L) % 1000000007L
    assert(row.getLong(0) == pairs.length.toLong, "n_fp_pairs drifted")
    assert(row.getLong(1) == pairs.map { case (a, b, _) =>
      groups(a).toLong * groups(b) }.sum, "n_image_pairs drifted")
    assert(row.getLong(2) == pairs.count(_._3 == 1).toLong)
    assert(row.getLong(3) == pairs.count(_._3 == 2).toLong)
    assert(row.getLong(4) == pairs.count(_._3 == 3).toLong)
    assert(row.getLong(5) == pairs.map { case (a, b, _) => pmod(a ^ b) }.sum)
    assert(pairs.nonEmpty, "fixture must exercise the near-dup path")
  }

  /** The audio energy-contour law re-derived arithmetically (one copy,
    * same reasoning as [[fpOf]]). */
  private def audioLawFp(id: Long): Long = {
    val n = (id % 256 + 64).toInt
    val energy = new Array[Long](65)
    for (t <- 0 until n)
      energy((t.toLong * 65 / n).toInt) += math.abs(RealCodec.sampleAt(id, t))
    var fp = 0L
    for (k <- 0 until 64) if (energy(k + 1) > energy(k)) fp |= (1L << k)
    fp
  }

  test("audio energy fingerprint matches the law and survives the RIFF round-trip") {
    // id=0 has n = 64 < 65 windows, so its 65th window is EMPTY — that
    // case exercises the zero-energy densification on both sides
    for (id <- Seq(0L, 63L, 64L, 499L, 2_000_000_001L)) {
      val rate = if (id % 2 == 0) 16000 else 8000
      val bytes = RealCodec.encodeWav(id, (id % 256 + 64).toInt, rate)
      assert(RealCodec.audioFingerprint(bytes) == audioLawFp(id),
        s"energy fingerprint drifted for id=$id")
    }
  }

  test("q_audio_fingerprint census matches the law re-derived in Scala") {
    val row = RealCodec.audioFingerprintCensus(spark, sfDir).collect()(0)
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val groups = ids.map(id => id -> audioLawFp(id)).groupBy(_._2)
    def pmod(x: Long) = ((x % 1000000007L) + 1000000007L) % 1000000007L
    assert(row.getLong(0) == ids.length.toLong)
    assert(row.getLong(1) == groups.size.toLong)
    assert(row.getLong(2) == (ids.length - groups.size).toLong)
    assert(row.getLong(3) == groups.values.map(_.length).max.toLong)
    assert(row.getLong(4) == groups.values.map(_.map(_._1).min).sum)
    assert(row.getLong(5) == groups.keys.map(pmod).sum)
  }

  test("q_audio_decode census matches the law re-derived in Scala") {
    val rows = RealCodec.audioDecodeStats(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val ids = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    val expect = ids.groupBy(id => if (id % 2 == 0) 16000L else 8000L).map { case (rate, g) =>
      val samples = g.flatMap { id =>
        (0 until (id % 256 + 64).toInt).map(t => RealCodec.sampleAt(id, t))
      }
      rate -> ((g.length.toLong, samples.length.toLong,
        samples.map(_.toLong).sum, samples.map(s => math.abs(s).toLong).sum,
        samples.min.toLong, samples.max.toLong))
    }
    assert(rows == expect, "decoded census drifted from the sample law")
  }
}

package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL media codecs over binary columns — the JDK ships them, no native
  * deps: `javax.imageio` decodes PNG/BMP/GIF/JPEG (lossless round-trip
  * for 8-bit gray PNG/BMP), and WAV/RIFF is plain little-endian byte
  * parsing. Together with [[VideoCodec]] (AVI container + per-frame BMP
  * decode, r15) every modality decodes for real — no stub remains.
  *
  * The oracle trick that makes a binary codec DuckDB-checkable: payloads
  * are rendered from a closed-form pixel/sample formula in the row's key,
  * the Spark side ENCODES (real compressed PNG bytes / real RIFF-framed
  * PCM) then DECODES with the real codec and aggregates the decoded
  * values, and the oracle recomputes the same aggregates from the formula
  * arithmetically. Any encode defect, decode defect, or lossy round-trip
  * shifts a sum and fails the hash compare — the codec itself is under
  * oracle test, not just the plumbing around it.
  *
  * Reference anchor: the reference treats record values as opaque bytes
  * end-to-end (`mapreduce/common/KeyValuePair.h`) and leaves decode to
  * map functions with `configure`/`teardown` codec-context hooks
  * (`mapreduce/functions/map/MapFunction.h:42`); here the codec context
  * is partition-local (`ImageIO.setUseCache(false)` + one reader per
  * task) and decode output feeds normal relational aggregation.
  *
  * Scale posture (100 TB): encode+decode are scan-local (zero shuffle
  * until the tiny per-dimension census), blob work is bounded per row by
  * the fixed pixel/sample budget, and `ImageIO.setUseCache(false)` keeps
  * the JDK codec off temp files — the default disk-backed stream cache
  * would write one temp file per record, a silent IOPS storm at scale.
  */
object RealCodec {

  // the JDK's default ImageIO behavior caches encode/decode streams in
  // temp FILES; one temp file per record at 100 TB is an IOPS storm.
  // Safe to set process-wide from executor threads (idempotent).
  ImageIO.setUseCache(false)

  /** Per-record pixel budget for EXTERNAL specs (the streaming ingest
    * path): 2^22 px ≈ a 2048×2048 frame, a 4 MB gray raster — far above
    * any law-derived batch spec, far below the multi-GB allocation a
    * hostile/corrupt (w, h) would force. Oversized specs are filtered
    * (quarantined), never decoded. */
  val MaxStreamPixels: Long = 1L << 22

  /** The audio twin of [[MaxStreamPixels]]: 2^22 PCM-16 samples ≈ 4.4
    * minutes at 16 kHz, an 8 MB buffer. */
  val MaxStreamSamples: Long = 1L << 22

  /** Sample-rate ceiling for external audio specs: 1 MHz covers every
    * real format (studio masters top out at 384 kHz) while keeping the
    * WAV header's byte-rate field (rate·2) far inside Int. */
  val MaxStreamRate: Long = 1L << 20

  // ------------------------------------------------------------- images

  /** The synthetic pixel law: gray(i, j) of image `mediaId` =
    * (i·31 + j·17 + mediaId) mod 256. Mirrored verbatim by the
    * q_image_decode oracle SQL. */
  def grayAt(mediaId: Long, i: Int, j: Int): Int =
    (((i.toLong * 31 + j.toLong * 17 + mediaId) % 256).toInt + 256) % 256

  /** Render the formula into a real 8-bit grayscale raster. */
  def renderGray(mediaId: Long, w: Int, h: Int): BufferedImage = {
    require(w > 0 && h > 0, s"renderGray: bad dims ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        raster.setSample(j, i, 0, grayAt(mediaId, i, j))
        j += 1
      }
      i += 1
    }
    img
  }

  /** Encode through the JDK's real writer ("png", "bmp", "gif", "jpg").
    * PNG output is genuinely DEFLATE-compressed — the decode leg below
    * exercises a real decompressor, not a byte copy. */
  def encodeImage(img: BufferedImage, format: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ok = ImageIO.write(img, format, bos)
    require(ok, s"encodeImage: no JDK ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Decoded-image census row (band 0 = gray/luma). */
  final case class DecodedImage(
      width: Int, height: Int, lumSum: Long, lumMin: Int, lumMax: Int)

  /** Decode with the real JDK codec (format sniffed from magic bytes) and
    * fold band-0 stats. Loud failure on unrecognized/corrupt payloads —
    * a pipeline must quarantine bad media, never emit silent zeros. */
  def decodeImage(bytes: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null,
      "decodeImage: no JDK codec recognized the payload " +
        "(bad magic, truncated header, or unsupported format)")
    foldImage(img)
  }

  /** Band-0 stat fold over an already-decoded raster (shared by the
    * sniffing decode above, the cached-reader query path, and the
    * video per-frame fold). */
  private[operators] def foldImage(img: BufferedImage): DecodedImage = {
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    var lumSum = 0L
    var lumMin = 256
    var lumMax = -1
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        val s = raster.getSample(j, i, 0)
        lumSum += s
        if (s < lumMin) lumMin = s
        if (s > lumMax) lumMax = s
        j += 1
      }
      i += 1
    }
    DecodedImage(w, h, lumSum, lumMin, lumMax)
  }

  /** Per-image decoded stats (DF row shape for the census query). */
  final case class ImageStats(
      media_id: Long, width: Int, height: Int,
      lum_sum: Long, lum_min: Int, lum_max: Int)

  /** Render spec rows (encoder-named so `.as[ImageSpec]` resolves). */
  final case class ImageSpec(media_id: Long, w: Int, h: Int)
  final case class AudioSpec(media_id: Long, rate: Int, n: Int)

  /** The ONE partition-local PNG round-trip all image paths share:
    * render → encode (real DEFLATE PNG) → decode, with a single cached
    * writer+reader serving the whole task (the ImageIO facades re-run
    * the plugin-registry lookup per call — measurable per record,
    * ruinous at drive volume). Generic in a carried payload so the
    * streaming path can thread its event time through.
    *
    * Resource discipline for long-running executors: the per-record
    * image streams close in `finally` (an encode/decode throw must not
    * leak its stream until GC), and the cached writer/reader dispose
    * when the underlying iterator drains — task threads in a streaming
    * query live for hours, so codec natives can't wait for GC. A task
    * KILLED mid-iteration skips the dispose; that residue is one
    * writer+reader pair reclaimed by GC, not a per-record leak. */
  private def pngRoundTrip[T](it: Iterator[(ImageSpec, T)]): Iterator[(Long, BufferedImage, T)] = {
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    val reader = ImageIO.getImageReadersByFormatName("png").next()
    new Iterator[(Long, BufferedImage, T)] {
      private var disposed = false
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !disposed) { disposed = true; writer.dispose(); reader.dispose() }
        h
      }
      override def next(): (Long, BufferedImage, T) = {
        val (s, t) = it.next()
        val bos = new ByteArrayOutputStream()
        val ios = ImageIO.createImageOutputStream(bos)
        try {
          writer.setOutput(ios)
          writer.write(renderGray(s.media_id, s.w, s.h))
        } finally ios.close()
        val iis = ImageIO.createImageInputStream(
          new ByteArrayInputStream(bos.toByteArray))
        val img = try {
          reader.setInput(iis)
          reader.read(0)
        } finally iis.close()
        (s.media_id, img, t)
      }
    }
  }

  /** Documents-driven render specs: w in 8..16, h in 8..14 — the bounded
    * per-row pixel budget every image query inherits. `keep` filters on
    * media_id BEFORE the opaque decode transform (Catalyst cannot push a
    * Filter through mapPartitions, so callers that want a subset must
    * inject the predicate here, where it reaches the parquet scan). */
  private def imageSpecs(spark: SparkSession, dir: String,
      keep: org.apache.spark.sql.Column): org.apache.spark.sql.Dataset[ImageSpec] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 9 + 8).cast("int").as("w"),
        (col("doc_id") % 7 + 8).cast("int").as("h"))
      .filter(keep)
      .as[ImageSpec]
  }

  /** q_image_decode: documents drive (media_id, w, h) specs with w in
    * 8..16, h in 8..14 (bounded pixel budget per row — the per-record
    * cost cap that keeps the scan uniform at any corpus size); each spec
    * renders → PNG-encodes → REAL-decodes partition-locally; the census
    * groups decoded stats by decoded width. Shuffles only the ≤9-group
    * census rows. */
  def imageDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageSpecs(spark, dir, lit(true))
      .mapPartitions { it =>
        pngRoundTrip(it.map((_, ()))).map { case (id, img, _) =>
          val d = foldImage(img)
          ImageStats(id, d.width, d.height, d.lumSum, d.lumMin, d.lumMax)
        }
      }
      .toDF()
      .groupBy(col("width").cast("long").as("width"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("width").cast("long") * col("height")).as("n_pixels"),
        sum(col("lum_sum")).as("lum_sum"),
        min(col("lum_min")).cast("long").as("lum_min"),
        max(col("lum_max")).cast("long").as("lum_max"))
  }

  /** q_image_decode oracle: the pixel law re-summed arithmetically —
    * range(14)×range(16) lateral grids filtered to each image's h×w. */
  val imageDecodeOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (doc_id % 9) + 8 AS w, (doc_id % 7) + 8 AS h
      |  FROM documents),
      |px AS (
      |  SELECT media_id, w, h,
      |    SUM((i.i*31 + j.j*17 + media_id) % 256) AS lum_sum,
      |    MIN((i.i*31 + j.j*17 + media_id) % 256) AS lum_min,
      |    MAX((i.i*31 + j.j*17 + media_id) % 256) AS lum_max
      |  FROM m CROSS JOIN range(14) i(i) CROSS JOIN range(16) j(j)
      |  WHERE i.i < h AND j.j < w
      |  GROUP BY 1, 2, 3)
      |SELECT w AS width, COUNT(*) AS n_images,
      |  CAST(SUM(w * h) AS BIGINT) AS n_pixels,
      |  CAST(SUM(lum_sum) AS BIGINT) AS lum_sum,
      |  CAST(MIN(lum_min) AS BIGINT) AS lum_min,
      |  CAST(MAX(lum_max) AS BIGINT) AS lum_max
      |FROM px GROUP BY 1""".stripMargin

  /** REAL raster resize — nearest-neighbor resample of a DECODED image
    * to `ow`×`oh` (out pixel (i,j) reads source (i·h/oh, j·w/ow), the
    * same integer index convention as [[dHash]]'s grid) — the thumbnail
    * / fixed-input-shape step a vision training pipeline runs between
    * decode and the model. Replaces nothing downstream: the output is
    * a real raster other codec passes consume. */
  def resizeImage(img: BufferedImage, ow: Int, oh: Int): BufferedImage = {
    require(ow > 0 && oh > 0, s"resizeImage: bad dims ${ow}x$oh")
    val (w, h) = (img.getWidth, img.getHeight)
    require(w > 0 && h > 0, s"resizeImage: empty source ${w}x$h")
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_BYTE_GRAY)
    val src = img.getRaster
    val dst = out.getRaster
    var i = 0
    while (i < oh) {
      val si = i * h / oh
      var j = 0
      while (j < ow) {
        dst.setSample(j, i, 0, src.getSample(j * w / ow, si, 0))
        j += 1
      }
      i += 1
    }
    out
  }

  /** q_image_resize: decode → REAL nearest-neighbor resize to a fixed
    * 12×10 model-input shape → census of the RESIZED rasters (sums,
    * extrema, and a positional checksum that pins every pixel to its
    * coordinate — a transposed or mirrored resize shifts it). The
    * resize consumes genuinely decoded rasters (PNG round-trip), and
    * the oracle replays the index math on the pixel law. Scan-local;
    * shuffles one census row. */
  def imageResizeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageSpecs(spark, dir, lit(true))
      .mapPartitions { it =>
        pngRoundTrip(it.map((_, ()))).map { case (id, img, _) =>
          val r = resizeImage(img, 12, 10)
          val raster = r.getRaster
          var s = 0L
          var pos = 0L
          var mn = 256
          var mx = -1
          var i = 0
          while (i < 10) {
            var j = 0
            while (j < 12) {
              val g = raster.getSample(j, i, 0)
              s += g
              pos += g.toLong * (i * 12 + j + 1)
              if (g < mn) mn = g
              if (g > mx) mx = g
              j += 1
            }
            i += 1
          }
          (id, s, pos, mn, mx)
        }
      }
      .toDF("media_id", "lum_sum", "pos_checksum", "lum_min", "lum_max")
      .agg(count(lit(1)).as("n_images"),
        sum(col("lum_sum")).as("lum_sum"),
        sum(pmod(col("pos_checksum"), lit(1000000007L))).as("pos_checksum"),
        min(col("lum_min")).cast("long").as("lum_min"),
        max(col("lum_max")).cast("long").as("lum_max"))
  }

  /** Laplacian sharpness fold over a DECODED raster — the classic
    * variance-of-Laplacian blur detector vision corpora filter on
    * (a defocused/resized-up image has a flat Laplacian; sharp detail
    * has a heavy-tailed one). Interior pixels only (the 4-neighbor
    * stencil); returns (n_px, lap_sum, lap_sq_sum) — integer-exact, so
    * the variance any caller derives is reproducible bit-for-bit. */
  def laplacianStats(img: BufferedImage): (Long, Long, Long) = {
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    var n = 0L
    var s = 0L
    var sq = 0L
    var i = 1
    while (i < h - 1) {
      var j = 1
      while (j < w - 1) {
        val lap = 4 * raster.getSample(j, i, 0) -
          raster.getSample(j, i - 1, 0) - raster.getSample(j, i + 1, 0) -
          raster.getSample(j - 1, i, 0) - raster.getSample(j + 1, i, 0)
        n += 1
        s += lap
        sq += lap.toLong * lap
        j += 1
      }
      i += 1
    }
    (n, s, sq)
  }

  /** q_image_sharpness: decode → Laplacian fold per image → global
    * census with per-image extrema (the blur-filter dial reads the
    * per-image lap_sq distribution; min/max bound it exactly). All
    * integer sums — a codec drift, a stencil slip, or an off-by-one on
    * the interior bounds shifts a sum. Scan-local; one census row
    * shuffles. */
  def imageSharpnessStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageSpecs(spark, dir, lit(true))
      .mapPartitions { it =>
        pngRoundTrip(it.map((_, ()))).map { case (id, img, _) =>
          val (n, s, sq) = laplacianStats(img)
          (id, n, s, sq)
        }
      }
      .toDF("media_id", "n_px", "lap_sum", "lap_sq")
      .agg(count(lit(1)).as("n_images"),
        sum(col("n_px")).as("n_lap_px"),
        sum(col("lap_sum")).as("lap_sum"),
        sum(col("lap_sq")).as("lap_sq_sum"),
        min(col("lap_sq")).as("min_img_sq"),
        max(col("lap_sq")).as("max_img_sq"))
  }

  /** q_image_sharpness oracle: the 4-neighbor stencil evaluated on the
    * pixel law directly — five law evaluations per interior pixel. */
  val imageSharpnessOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (doc_id % 9) + 8 AS w, (doc_id % 7) + 8 AS h
      |  FROM documents),
      |px AS (
      |  SELECT media_id,
      |    4*((i.i*31 + j.j*17 + media_id) % 256)
      |    - (((i.i-1)*31 + j.j*17 + media_id) % 256)
      |    - (((i.i+1)*31 + j.j*17 + media_id) % 256)
      |    - ((i.i*31 + (j.j-1)*17 + media_id) % 256)
      |    - ((i.i*31 + (j.j+1)*17 + media_id) % 256) AS lap
      |  FROM m CROSS JOIN range(1, 13) i(i) CROSS JOIN range(1, 15) j(j)
      |  WHERE i.i < h - 1 AND j.j < w - 1),
      |per AS (
      |  SELECT media_id, COUNT(*) AS n_px,
      |    SUM(lap) AS lap_sum, SUM(lap * lap) AS lap_sq
      |  FROM px GROUP BY 1)
      |SELECT COUNT(*) AS n_images,
      |  CAST(SUM(n_px) AS BIGINT) AS n_lap_px,
      |  CAST(SUM(lap_sum) AS BIGINT) AS lap_sum,
      |  CAST(SUM(lap_sq) AS BIGINT) AS lap_sq_sum,
      |  CAST(MIN(lap_sq) AS BIGINT) AS min_img_sq,
      |  CAST(MAX(lap_sq) AS BIGINT) AS max_img_sq
      |FROM per""".stripMargin

  /** REAL raster augmentation — the flip/rotate family a vision
    * training pipeline multiplies its corpus with. Index maps (out
    * (i,j) reads source …): hflip (i, w−1−j); vflip (h−1−i, j); rot180
    * (h−1−i, w−1−j). All lossless coordinate permutations of the
    * DECODED raster, so the law oracle replays them exactly. */
  def augmentImage(img: BufferedImage, kind: String): BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val src = img.getRaster
    val dst = out.getRaster
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        val g = kind match {
          case "hflip" => src.getSample(w - 1 - j, i, 0)
          case "vflip" => src.getSample(j, h - 1 - i, 0)
          case "rot180" => src.getSample(w - 1 - j, h - 1 - i, 0)
          case other =>
            throw new IllegalArgumentException(s"augmentImage: unknown kind '$other'")
        }
        dst.setSample(j, i, 0, g)
        j += 1
      }
      i += 1
    }
    out
  }

  /** q_image_augment: decode → the three flips/rotations per image →
    * per-variant positional-checksum census. The value sums are
    * flip-invariant by construction (the same pixels in a different
    * order), so the POSITIONAL checksum is the load-bearing column:
    * it proves each variant's pixels landed at the permuted
    * coordinates, per variant. One decode feeds all variants
    * (augmentation multiplies examples, not decode cost). */
  def imageAugmentStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageSpecs(spark, dir, lit(true))
      .mapPartitions { it =>
        pngRoundTrip(it.map((_, ()))).flatMap { case (id, img, _) =>
          Seq("hflip", "vflip", "rot180").map { k =>
            val a = augmentImage(img, k)
            val raster = a.getRaster
            var s = 0L
            var pos = 0L
            var i = 0
            while (i < a.getHeight) {
              var j = 0
              while (j < a.getWidth) {
                val g = raster.getSample(j, i, 0)
                s += g
                pos += g.toLong * (i * a.getWidth + j + 1)
                j += 1
              }
              i += 1
            }
            (k, id, s, pos)
          }
        }
      }
      .toDF("variant", "media_id", "lum_sum", "pos_checksum")
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("lum_sum")).as("lum_sum"),
        sum(pmod(col("pos_checksum"), lit(1000000007L))).as("pos_checksum"))
  }

  /** q_image_augment oracle: the pixel law at the permuted indices per
    * variant — one lateral grid, three index maps. */
  val imageAugmentOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (doc_id % 9) + 8 AS w, (doc_id % 7) + 8 AS h
      |  FROM documents),
      |px AS (
      |  SELECT media_id, v.variant,
      |    (CASE v.variant
      |       WHEN 'hflip' THEN (i.i*31 + (w-1-j.j)*17 + media_id)
      |       WHEN 'vflip' THEN ((h-1-i.i)*31 + j.j*17 + media_id)
      |       ELSE ((h-1-i.i)*31 + (w-1-j.j)*17 + media_id)
      |     END) % 256 AS g,
      |    i.i * w + j.j + 1 AS pos
      |  FROM m
      |  CROSS JOIN (SELECT unnest(['hflip','vflip','rot180']) AS variant) v
      |  CROSS JOIN range(14) i(i) CROSS JOIN range(16) j(j)
      |  WHERE i.i < h AND j.j < w),
      |per AS (
      |  SELECT media_id, variant, SUM(g) AS lum_sum,
      |    SUM(g * pos) AS pos_checksum
      |  FROM px GROUP BY 1, 2)
      |SELECT variant, COUNT(*) AS n_images,
      |  CAST(SUM(lum_sum) AS BIGINT) AS lum_sum,
      |  CAST(SUM(((pos_checksum % 1000000007) + 1000000007) % 1000000007)
      |    AS BIGINT) AS pos_checksum
      |FROM per GROUP BY 1""".stripMargin

  /** q_image_resize oracle: the pixel law at the resampled indices —
    * out (i,j) of image id reads law point (i·h/10, j·w/12). */
  val imageResizeOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (doc_id % 9) + 8 AS w, (doc_id % 7) + 8 AS h
      |  FROM documents),
      |px AS (
      |  SELECT media_id,
      |    (((i.i * h) // 10) * 31 + ((j.j * w) // 12) * 17 + media_id) % 256 AS g,
      |    i.i * 12 + j.j + 1 AS pos
      |  FROM m CROSS JOIN range(10) i(i) CROSS JOIN range(12) j(j)),
      |per AS (
      |  SELECT media_id, SUM(g) AS lum_sum,
      |    SUM(g * pos) AS pos_checksum,
      |    MIN(g) AS lum_min, MAX(g) AS lum_max
      |  FROM px GROUP BY 1)
      |SELECT COUNT(*) AS n_images,
      |  CAST(SUM(lum_sum) AS BIGINT) AS lum_sum,
      |  CAST(SUM(((pos_checksum % 1000000007) + 1000000007) % 1000000007)
      |    AS BIGINT) AS pos_checksum,
      |  CAST(MIN(lum_min) AS BIGINT) AS lum_min,
      |  CAST(MAX(lum_max) AS BIGINT) AS lum_max
      |FROM per""".stripMargin

  // ------------------------------------------- perceptual-hash image dedup

  /** dHash (difference hash) of a DECODED image: nearest-neighbor resample
    * to a 9×8 luminance grid, then bit i·8+j = 1 iff grid(i, j+1) >
    * grid(i, j) — the classic 64-bit perceptual fingerprint (gradient
    * directions survive rescaling/re-encoding, so re-encoded or resized
    * copies of one image collide). Packs bit 63 into the sign bit, which
    * the oracle mirrors exactly, so fingerprint GROUPS — not just
    * checksums — agree bit-for-bit across engines. */
  def dHash(img: BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    require(w > 0 && h > 0, s"dHash: empty raster ${w}x$h")
    // below 9x8 the nearest-neighbor indexes repeat (standard upsampling)
    // — the oracle's index math repeats identically, so parity holds
    val raster = img.getRaster
    var fp = 0L
    var i = 0
    while (i < 8) {
      val si = i * h / 8
      var j = 0
      while (j < 8) {
        val g0 = raster.getSample(j * w / 9, si, 0)
        val g1 = raster.getSample((j + 1) * w / 9, si, 0)
        if (g1 > g0) fp |= (1L << (i * 8 + j))
        j += 1
      }
      i += 1
    }
    fp
  }

  /** q_image_dhash: perceptual-hash image dedup census — the dedup family
    * extended to the image modality, with the fingerprint computed from
    * REAL decoded pixels (PNG encode → cached-reader decode → dHash), not
    * from payload bytes. Keep-first semantics per fingerprint (lowest
    * media_id owns the group) exactly like exact text dedup; the census
    * reports corpus/kept/dropped counts, the largest clique, the
    * keep-first owner checksum, and a fingerprint checksum. Groups join
    * on the 64-bit fingerprint — byte-identical AND re-encoded copies
    * collide; near-dup (Hamming ≤ k) extends via the same Manku banding
    * SimHash uses, on this fingerprint column.
    *
    * Scale shape: decode+hash are scan-local; the only shuffle carries
    * (fingerprint, partial count, partial min) pairs — 8 bytes + counters
    * per distinct fingerprint, never pixels. A hot fingerprint (boiler-
    * plate logo at drive volume) lands on one reducer as ONE combined
    * row, not a row per copy — map-side partial agg is the guard here. */
  /** (media_id, fp) perceptual fingerprints of the documents-driven image
    * set, each computed from a REAL decoded raster (PNG encode →
    * cached-reader decode → dHash). `keep` reaches the scan, BELOW the
    * decode — a subset caller decodes only its subset. The projection
    * this defines IS the production fingerprint table — serving paths
    * read it persisted, not re-decoded (same stance as the text-dedup
    * hash column). */
  private def imageFingerprints(spark: SparkSession, dir: String,
      keep: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    imageSpecs(spark, dir, keep)
      .mapPartitions { it =>
        pngRoundTrip(it.map((_, ()))).map { case (id, img, _) => (id, dHash(img)) }
      }
      .toDF("media_id", "fp")
  }

  /** Keep-first census over a (media_id, fp) fingerprint frame — ONE
    * body for the image and audio modalities so the two censuses are
    * provably identical (only the corpus-count alias differs). Shuffle
    * carries 8-byte fingerprints + counters, never payloads; a hot
    * fingerprint combines map-side into one row per task. */
  private[graft] def keepFirstCensus(fps: DataFrame, countAlias: String): DataFrame =
    fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), min(col("media_id")).as("kept"))
      .agg(sum(col("n")).as(countAlias),
        count(lit(1)).as("n_kept"),
        (sum(col("n")) - count(lit(1))).as("n_dropped"),
        max(col("n")).as("max_group"),
        // pmod-folded like fp_checksum: api/Media feeds this body
        // ARBITRARY external ids — a corpus keyed by hashed 63-bit ids
        // would overflow a raw Long sum within rows (ANSI throw)
        sum(pmod(col("kept"), lit(1000000007L))).as("kept_id_sum"),
        sum(pmod(col("fp"), lit(1000000007L))).as("fp_checksum"))

  def imageDHashCensus(spark: SparkSession, dir: String): DataFrame =
    keepFirstCensus(imageFingerprints(spark, dir, lit(true)), "n_images")

  /** q_image_neardup: NEAR-duplicate images — 0 < Hamming ≤ 3 between
    * dHash fingerprints — via the engine's one banding scheme: the
    * 64-bit Manku 3-of-6-block combo keys SimHash uses
    * ([[graft.queries.TextPipeline.simBlockOff64]]), exhaustive for
    * Hamming ≤ 3 by pigeonhole (≤3 flipped bits touch ≤3 of 6 blocks, so
    * some 3-block combo is untouched and the pair shares that key).
    *
    * The decisive scale property: the banded join runs over DISTINCT
    * fingerprints, not images. dHash has ≤ 2⁶⁴ values but this corpus
    * law admits ≤ 63·256 = 16,128 — and real corpora concentrate far
    * below image count too — so pair enumeration is bounded by
    * fingerprint diversity while image-pair VOLUME (n_a·n_b per
    * fingerprint pair) is recovered arithmetically from group sizes.
    * Identical-fingerprint pairs (Hamming 0) are exact-dup business —
    * q_image_dhash's census — and are excluded here. */
  def imageNearDupCensus(spark: SparkSession, dir: String): DataFrame =
    nearDupCensus(imageFingerprints(spark, dir, lit(true)), "n_image_pairs")

  /** ONE near-dup body for the image and audio modalities (the
    * keep-first-census sharing stance): banded candidate join over
    * DISTINCT fingerprints, exact Hamming 1..3 on the XOR, pair volume
    * recovered from group sizes. `pairAlias` names the modality's
    * payload-pair count column; everything else is provably identical
    * across modalities because it is the same body. */
  private[graft] def nearDupCensus(fps: DataFrame, pairAlias: String): DataFrame = {
    import graft.queries.TextPipeline.{simBlockOff64, simBlockMod64}
    val groups = fps
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n"))
    val bands = groups.select(col("fp"), col("n"),
      graft.queries.TextPipeline
        .simBandKeys("fp", simBlockOff64, simBlockMod64).as("bk"))
    bands.as("l").join(bands.as("r"),
        col("l.bk") === col("r.bk") && col("l.fp") < col("r.fp"))
      .select(col("l.fp").as("fp_a"), col("r.fp").as("fp_b"),
        col("l.n").as("na"), col("r.n").as("nb"),
        expr("bit_count(l.fp ^ r.fp)").cast("long").as("hamming"))
      .groupBy(col("fp_a"), col("fp_b"), col("na"), col("nb"))
      .agg(min(col("hamming")).as("hamming"))
      .filter(col("hamming").between(1, 3))
      .agg(count(lit(1)).as("n_fp_pairs"),
        sum(col("na") * col("nb")).as(pairAlias),
        sum(when(col("hamming") === 1, 1L).otherwise(0L)).as("h1"),
        sum(when(col("hamming") === 2, 1L).otherwise(0L)).as("h2"),
        sum(when(col("hamming") === 3, 1L).otherwise(0L)).as("h3"),
        sum(pmod(expr("fp_a ^ fp_b"), lit(1000000007L))).as("xor_checksum"))
  }

  /** The law→fingerprint derivation (columns: media_id, fp) shared by
    * the image fingerprint oracles AND the video per-frame oracle via
    * interpolation — the TextPipeline oracle convention, so the copies
    * cannot drift. The `m` CTE is the parameter: it must provide
    * (media_id, seed, w, h), where `seed` is the pixel law's additive
    * term (the image id for stills; id + 101·frame for video frames) and
    * `media_id` is the identity the fingerprint is censused under.
    * BIGINT cast, not SUM's HUGEINT: xor on 128-bit two's complement
    * gives a cross-sign pair 64 phantom upper bits and inflates its
    * Hamming distance past the ≤3 window (the r14 oracle-side twin of
    * the engine-side signed-% banding bug). */
  private[operators] def fpLawSqlFrom(mCte: String): String =
    s"""$mCte,
      |g AS (
      |  SELECT media_id, i.i AS i, j.j AS j,
      |    (((i.i * h) // 8) * 31 + ((j.j * w) // 9) * 17 + seed) % 256 AS g
      |  FROM m CROSS JOIN range(8) i(i) CROSS JOIN range(9) j(j)),
      |b AS (
      |  SELECT media_id, i, j, g,
      |    lead(g) OVER (PARTITION BY media_id, i ORDER BY j) AS gn
      |  FROM g),
      |fp AS (
      |  SELECT media_id,
      |    CAST(SUM(CASE WHEN gn > g THEN
      |      CASE WHEN i*8 + j = 63 THEN (-9223372036854775807 - 1)
      |           ELSE (1::BIGINT << (i*8 + j)) END
      |      ELSE 0 END) AS BIGINT) AS fp
      |  FROM b WHERE j < 8 GROUP BY media_id)""".stripMargin

  /** [[fpLawSqlFrom]] instantiated at the still-image spec law. */
  private val fpLawSql: String = fpLawSqlFrom(
    """m AS (
      |  SELECT doc_id AS media_id, doc_id AS seed,
      |    (doc_id % 9) + 8 AS w, (doc_id % 7) + 8 AS h
      |  FROM documents)""".stripMargin)

  /** q_image_neardup oracle: brute-force Hamming over the law-derived
    * DISTINCT fingerprints (diversity-bounded, so n² on fingerprints is
    * cheap oracle-side), exactly the frame the banded join must equal —
    * the banding's exhaustiveness is thereby oracle-tested on real
    * fingerprints, not just argued. */
  val imageNearDupOracle: String =
    s"""WITH $fpLawSql,
      |grp AS (SELECT fp, COUNT(*) AS n FROM fp GROUP BY fp),
      |pairs AS (
      |  SELECT a.fp AS fp_a, b.fp AS fp_b, a.n AS na, b.n AS nb,
      |    bit_count(xor(a.fp, b.fp)) AS hamming
      |  FROM grp a JOIN grp b ON a.fp < b.fp
      |  WHERE bit_count(xor(a.fp, b.fp)) BETWEEN 1 AND 3)
      |SELECT COUNT(*) AS n_fp_pairs,
      |  CAST(SUM(na * nb) AS BIGINT) AS n_image_pairs,
      |  CAST(SUM(CASE WHEN hamming = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
      |  CAST(SUM(CASE WHEN hamming = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
      |  CAST(SUM(CASE WHEN hamming = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
      |  CAST(SUM(((xor(fp_a, fp_b) % 1000000007) + 1000000007) % 1000000007)
      |    AS BIGINT) AS xor_checksum
      |FROM pairs""".stripMargin

  /** The PERSISTED perceptual-fingerprint index both media serve legs
    * read their history through: the (media_id, fp) projection is
    * written to parquet inside a [[graft.plans.DeferredIngest]] stage
    * (construction job-free — the decode job runs when the serve
    * executes, like every operator) and READ BACK for serving. This is
    * the q_ann_lsh_served / q_dedup_incremental contract carried to the
    * media modalities: the index is an ordinary partitionable table on
    * storage, so serving pays a parquet scan of 16-byte rows — never a
    * re-decode of the accumulated corpus — and persistence must not
    * change a row (the fingerprints are BIGINTs; the parquet round-trip
    * is lossless, so the serve stays hash-identical to a live build). */
  private[operators] def persistedFingerprints(spark: SparkSession, dir: String,
      tag: String, build: => DataFrame): DataFrame = {
    val out = graft.core.Scratch.dir(tag, dir)
    graft.plans.DeferredIngest(spark, "media_id BIGINT, fp BIGINT") {
      build.write.mode("overwrite").parquet(out)
      spark.read.parquet(out).select(col("media_id"), col("fp"))
    }
  }

  /** q_image_dedup_serve: the crawl-vs-history serve shape for image
    * dedup — a new batch (stand-in: media_id ≡ 0 mod 7) checked against
    * the accumulated corpus by PERCEPTUAL fingerprint, the image twin of
    * the text pipeline's incremental content-hash dedup. The join
    * carries only 8-byte fingerprints (never pixels), equi-keyed; the
    * history side reads the PERSISTED fingerprint table
    * ([[persistedFingerprints]] — built once inside the deferred stage,
    * then an ordinary parquet scan), so serve decode work is ∝ batch,
    * not corpus: only the batch side runs the codec.
    *
    * The %7 split is injected BELOW the decode (imageFingerprints'
    * `keep` reaches the parquet scan): each side decodes only its own
    * subset, one corpus decode total. Filtering the shared frame above
    * the opaque mapPartitions instead would decode the whole corpus
    * TWICE — Catalyst cannot push a Filter through mapPartitions. */
  def imageDedupServe(spark: SparkSession, dir: String): DataFrame =
    dedupServe(
      persistedFingerprints(spark, dir, "imgfpidx",
        imageFingerprints(spark, dir, col("media_id") % 7 =!= 0)),
      imageFingerprints(spark, dir, col("media_id") % 7 === 0))

  /** ONE serve body for both modalities (the nearDupCensus sharing
    * stance): distinct history fingerprints left-joined under the batch,
    * then the batch census — dup count, surviving ids, new-fingerprint
    * checksum. History arrives as the persisted (media_id, fp) table;
    * the distinct() collapses it to the fingerprint SET serving needs
    * (8 bytes per distinct fingerprint through the join, map-side
    * combined). */
  private[graft] def dedupServe(history: DataFrame, batch: DataFrame): DataFrame = {
    val hist = history.select(col("fp")).distinct().withColumn("dup", lit(1L))
    batch
      .join(hist, Seq("fp"), "left")
      .agg(count(lit(1)).as("n_batch"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dups"),
        // pmod-folded (the keepFirstCensus stance): external 63-bit ids
        // through api/Media.serveAgainstHistory must not overflow
        sum(when(col("dup").isNull, pmod(col("media_id"), lit(1000000007L))))
          .as("kept_id_sum"),
        sum(when(col("dup").isNull, pmod(col("fp"), lit(1000000007L))))
          .as("new_fp_checksum"))
  }

  /** q_image_dedup_serve oracle: same law-derived fingerprints, same
    * batch/history split, left join on the BIGINT fingerprint. */
  val imageDedupServeOracle: String =
    s"""WITH $fpLawSql,
      |hist AS (SELECT DISTINCT fp FROM fp WHERE media_id % 7 != 0)
      |SELECT COUNT(*) AS n_batch,
      |  CAST(SUM(CASE WHEN hist.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
      |  CAST(SUM(CASE WHEN hist.fp IS NULL
      |    THEN ((media_id % 1000000007) + 1000000007) % 1000000007 END)
      |    AS BIGINT) AS kept_id_sum,
      |  CAST(SUM(CASE WHEN hist.fp IS NULL
      |    THEN ((f.fp % 1000000007) + 1000000007) % 1000000007 END) AS BIGINT)
      |    AS new_fp_checksum
      |FROM fp f LEFT JOIN hist ON hist.fp = f.fp
      |WHERE f.media_id % 7 = 0""".stripMargin

  /** Streaming media ingest with on-the-fly perceptual dedup: decode +
    * dHash run INSIDE the stream (stateless partition-local transform —
    * the same cached-codec loop as the batch path), then keep-first per
    * fingerprint within the watermark via
    * `dropDuplicatesWithinWatermark` — the crawl-firehose shape: a
    * re-crawled or re-encoded copy of an image arriving minutes later is
    * suppressed before it ever reaches the corpus, and state is bounded
    * by the watermark horizon, not the corpus. Input: a streaming frame
    * with (media_id, w, h, ts); output: append-mode (media_id, fp, ts)
    * of first-seen fingerprints. StreamingMediaSpec pins suppression
    * across batches, new-fingerprint passage, and poison-record
    * quarantine.
    *
    * Malformed specs (null id/ts, non-positive dims, dims past the
    * [[MaxStreamPixels]] budget) are QUARANTINED by filter, not decoded:
    * a throw inside the stream's mapPartitions kills the query, and on
    * restart the source replays the same micro-batch — one poison
    * record would crash-loop ingest forever. The upper bound matters as
    * much as the lower: dims are external input here, and a w=h=50000
    * spec would OOM inside renderGray (a multi-GB raster) — the same
    * crash-loop by another door. The batch paths need no such guard
    * (their specs are law-derived, always inside the pixel budget). */
  def fingerprintStream(media: DataFrame, watermark: String): DataFrame = {
    import media.sparkSession.implicits._
    // quarantine BEFORE any narrowing cast, on try_cast'd wide values:
    // external specs can arrive as BIGINT/DECIMAL, and under ANSI mode
    // (Spark 4's default) a narrowing cast or an overflowing product
    // inside the predicate would THROW — the filter itself becoming the
    // crash-loop. try_cast nulls the unrepresentable; each dim is
    // bounded before the product so w·h cannot overflow (≤ 2^44); the
    // int casts below are then provably safe
    media.select(expr("try_cast(media_id AS BIGINT)").as("media_id"),
        expr("try_cast(w AS BIGINT)").as("w"),
        expr("try_cast(h AS BIGINT)").as("h"), col("ts"))
      .filter(col("media_id").isNotNull && col("ts").isNotNull &&
        col("w").between(1, MaxStreamPixels) &&
        col("h").between(1, MaxStreamPixels) &&
        col("w") * col("h") <= MaxStreamPixels)
      .select(col("media_id"), col("w").cast("int").as("w"),
        col("h").cast("int").as("h"), col("ts"))
      .as[(Long, Int, Int, java.sql.Timestamp)]
      .mapPartitions { it =>
        pngRoundTrip(it.map { case (id, w, h, t) => (ImageSpec(id, w, h), t) })
          .map { case (id, img, t) => (id, dHash(img), t) }
      }
      .toDF("media_id", "fp", "ts")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** The audio twin of [[fingerprintStream]]: encode → REAL RIFF parse
    * → energy-contour fingerprint inside the stream, then watermarked
    * keep-first per fingerprint — a re-encoded or re-posted copy of a
    * clip arriving minutes later is suppressed before reaching the
    * corpus. Same quarantine stance: null id/ts, non-positive shape,
    * or a sample count past [[MaxStreamSamples]] (an external spec
    * driving a multi-GB PCM buffer) is filtered, never decoded — a
    * throw would crash-loop the replayed micro-batch. Input
    * (media_id, n, rate, ts); output append-mode (media_id, fp, ts)
    * of first-seen fingerprints. */
  def audioFingerprintStream(media: DataFrame, watermark: String): DataFrame = {
    import media.sparkSession.implicits._
    // same quarantine-before-narrowing stance as the image stream; the
    // rate bound keeps encodeWav's byte-rate field (rate·2) inside Int
    media.select(expr("try_cast(media_id AS BIGINT)").as("media_id"),
        expr("try_cast(n AS BIGINT)").as("n"),
        expr("try_cast(rate AS BIGINT)").as("rate"), col("ts"))
      .filter(col("media_id").isNotNull && col("ts").isNotNull &&
        col("n").between(1, MaxStreamSamples) &&
        col("rate").between(1, MaxStreamRate))
      .select(col("media_id"), col("n").cast("int").as("n"),
        col("rate").cast("int").as("rate"), col("ts"))
      .as[(Long, Int, Int, java.sql.Timestamp)]
      .mapPartitions { it =>
        it.map { case (id, n, rate, t) =>
          (id, audioFingerprint(encodeWav(id, n, rate)), t)
        }
      }
      .toDF("media_id", "fp", "ts")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** q_image_dhash oracle: the pixel law resampled with the same integer
    * nearest-neighbor index math, gradient bits packed into a BIGINT with
    * the same sign-bit convention, grouped identically. */
  val imageDHashOracle: String =
    s"""WITH $fpLawSql,
      |grp AS (
      |  SELECT fp, COUNT(*) AS n, MIN(media_id) AS kept
      |  FROM fp GROUP BY fp)
      |SELECT CAST(SUM(n) AS BIGINT) AS n_images,
      |  COUNT(*) AS n_kept,
      |  CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dropped,
      |  CAST(MAX(n) AS BIGINT) AS max_group,
      |  CAST(SUM(((kept % 1000000007) + 1000000007) % 1000000007) AS BIGINT) AS kept_id_sum,
      |  CAST(SUM(((fp % 1000000007) + 1000000007) % 1000000007) AS BIGINT) AS fp_checksum
      |FROM grp""".stripMargin

  // -------------------------------------------------------------- audio

  /** The synthetic sample law: s(t) of clip `mediaId` =
    * ((mediaId·104729 + t·7919) mod 65536) − 32768 (signed 16-bit PCM).
    * Mirrored verbatim by the q_audio_decode oracle SQL. */
  def sampleAt(mediaId: Long, t: Int): Int =
    ((((mediaId * 104729 + t.toLong * 7919) % 65536) + 65536) % 65536).toInt - 32768

  /** Encode a real RIFF/WAVE file: canonical header, a custom 'grft'
    * tag chunk the parser must SKIP (with RIFF's odd-size pad byte —
    * "graft:<id>" tags come in both parities across ids), then the
    * 16-bit LE PCM data chunk. The fmt/data framing matches what
    * `audiofile`/`soundfile` emit for the same samples; the tag rides a
    * private chunk id rather than a 'LIST' (a conformant LIST requires
    * a 4-byte list-type ID plus sub-chunks — a raw tag payload there
    * would be malformed to strict external decoders, while an unknown
    * private chunk is exactly what the RIFF skip rule exists for). */
  def encodeWav(mediaId: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    require(nSamples > 0, s"encodeWav: bad shape n=$nSamples")
    encodeWavSamples(mediaId,
      Array.tabulate(nSamples)(t => sampleAt(mediaId, t).toShort), sampleRate)
  }

  /** The RIFF/WAVE writer over explicit samples — [[encodeWav]] feeds
    * it the law; [[resampleWav]] feeds it interpolated PCM. */
  private def encodeWavSamples(mediaId: Long, samples: Array[Short],
      sampleRate: Int): Array[Byte] = {
    require(samples.nonEmpty && sampleRate > 0,
      s"encodeWav: bad shape n=${samples.length} rate=$sampleRate")
    val tag = s"graft:$mediaId".getBytes("US-ASCII")
    val tagPadded = tag.length + (tag.length & 1)
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + tagPadded) + (8 + dataLen)
    val buf = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
    buf.put("grft".getBytes("US-ASCII")).putInt(tag.length).put(tag)
    if ((tag.length & 1) == 1) buf.put(0.toByte) // RIFF even-size pad
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var t = 0
    while (t < samples.length) {
      buf.putShort(samples(t))
      t += 1
    }
    buf.array()
  }

  /** Linear-interpolation PCM resampling over a REAL-parsed WAV — the
    * rate-normalization step an audio training pipeline runs before
    * featurization (ASR stacks standardize on one rate; a corpus
    * arrives at many). Parse → interpolate → re-encode, all real:
    * output sample k sits at source position k·srcRate/outRate and is
    * the exact integer-weighted average of its two neighbors, computed
    * in UNSIGNED space (sample + 32768) so the floor division is
    * unambiguous across engines — the q_audio_resample oracle replays
    * the identical arithmetic on the sample law. Output length
    * ⌊(n−1)·outRate/srcRate⌋ + 1 (endpoints preserved: position 0 and
    * the last exactly-representable source instant). */
  def resampleWav(mediaId: Long, bytes: Array[Byte], outRate: Int): Array[Byte] = {
    require(outRate > 0, s"resampleWav: bad rate $outRate")
    val (buf, srcRate, n) = walkWav(bytes)
    // walkWav accepts a well-formed empty data chunk; resampling it
    // would truncate (n-1)·R2/R1 toward zero and index into an empty
    // array — fail with the codec family's loud diagnostic instead
    require(n > 0, "resampleWav: empty PCM data (no samples to resample)")
    val src = new Array[Int](n)
    var t = 0
    while (t < n) { src(t) = buf.getShort.toInt; t += 1 }
    val n2 = ((n - 1).toLong * outRate / srcRate).toInt + 1
    val out = new Array[Short](n2)
    var k = 0
    while (k < n2) {
      val num = k.toLong * srcRate
      val p = (num / outRate).toInt
      val rem = num % outRate
      out(k) =
        if (rem == 0 || p + 1 >= n) src(p).toShort
        else {
          // weighted average on unsigned values: every operand is
          // nonnegative, so the floor division matches SQL's // exactly
          val ua = (src(p) + 32768).toLong
          val ub = (src(p + 1) + 32768).toLong
          ((ua * (outRate - rem) + ub * rem) / outRate - 32768).toShort
        }
      k += 1
    }
    encodeWavSamples(mediaId, out, outRate)
  }

  /** Decoded-clip census row. */
  final case class AudioStats(
      media_id: Long, sample_rate: Int, n_samples: Long,
      amp_sum: Long, amp_abs_sum: Long, amp_min: Int, amp_max: Int)

  /** The ONE RIFF chunk walker both audio consumers share (stats fold,
    * energy fingerprint): verify the RIFF/WAVE magic, iterate chunks
    * honoring the even-size pad rule, validate the PCM-16 mono fmt, and
    * return the parser positioned at the data chunk's first sample with
    * (sampleRate, nSamples). Loud failure on bad magic, missing/garbled
    * fmt, or a chunk that overruns the payload (truncated file) — the
    * diagnostics keep the historical `decodeWav:` prefix both consumers'
    * callers and the fuzz sweep know. */
  private def walkWav(bytes: Array[Byte]): (ByteBuffer, Int, Int) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii4(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 44, s"decodeWav: ${bytes.length}B is no WAV")
    require(ascii4() == "RIFF", "decodeWav: bad RIFF magic")
    val riffLen = buf.getInt
    require(riffLen == bytes.length - 8,
      s"decodeWav: RIFF length $riffLen != payload ${bytes.length - 8}")
    require(ascii4() == "WAVE", "decodeWav: bad WAVE magic")
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (buf.remaining() >= 8 && dataOff < 0) {
      val id = ascii4()
      val len = buf.getInt
      // Long arithmetic: a hostile len near Int.MaxValue would wrap
      // position+len negative and sneak past an Int comparison. The
      // guard covers the RIFF pad byte too — skip paths advance by
      // len + (len & 1), so an odd final chunk flush with the payload
      // end must fail HERE with the parser's diagnostic, not inside
      // ByteBuffer.position() with the JDK's opaque one
      require(len >= 0 && buf.position().toLong + len + (len & 1) <= bytes.length,
        s"decodeWav: chunk '$id' of $len bytes overruns the payload (truncated?)")
      id match {
        case "fmt " =>
          require(len >= 16, s"decodeWav: fmt chunk too short ($len)")
          val fmtCode = buf.getShort
          val channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          require(fmtCode == 1 && channels == 1 && bits == 16,
            s"decodeWav: only PCM-16 mono supported (fmt=$fmtCode ch=$channels bits=$bits)")
          buf.position(buf.position() + (len - 16) + (len & 1))
        case "data" =>
          dataOff = buf.position(); dataLen = len
        case _ => // skip unknown chunks ('grft' tag etc.), honoring the pad
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(sampleRate > 0, "decodeWav: no fmt chunk before data")
    require(dataOff >= 0, "decodeWav: no data chunk")
    require(dataLen % 2 == 0, s"decodeWav: odd PCM-16 data length $dataLen")
    buf.position(dataOff)
    (buf, sampleRate, dataLen / 2)
  }

  /** Decoded-clip amplitude stats: [[walkWav]] positions the parser at
    * the PCM data, then one pass folds sum/abs-sum/min/max over the
    * little-endian 16-bit samples. */
  def decodeWav(mediaId: Long, bytes: Array[Byte]): AudioStats = {
    val (buf, sampleRate, n) = walkWav(bytes)
    var ampSum = 0L
    var ampAbs = 0L
    var ampMin = 65536
    var ampMax = -65536
    var t = 0
    while (t < n) {
      val s = buf.getShort.toInt
      ampSum += s
      ampAbs += math.abs(s)
      if (s < ampMin) ampMin = s
      if (s > ampMax) ampMax = s
      t += 1
    }
    AudioStats(mediaId, sampleRate, n.toLong, ampSum, ampAbs, ampMin, ampMax)
  }

  /** The audio twin of [[dHash]]: a 64-bit energy-contour fingerprint
    * from REAL-parsed PCM. Samples map to 65 near-equal windows
    * (window(t) = t·65/n, the same integer nearest-neighbor convention
    * as dHash's grid; windows can be empty for n < 65 — both sides
    * treat an empty window as zero energy), per-window energy is the
    * abs-amplitude sum, and bit k = 1 iff E(k+1) > E(k) — the loudness
    * CONTOUR, which survives volume scaling and re-encoding the way
    * dHash's gradients survive resizing. Sign-bit packing mirrored
    * exactly by the oracle. */
  def audioFingerprint(bytes: Array[Byte]): Long = {
    val (buf, _, n) = walkWav(bytes)
    val energy = new Array[Long](65)
    var t = 0
    while (t < n) {
      energy((t.toLong * 65 / n).toInt) += math.abs(buf.getShort.toInt)
      t += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (energy(k + 1) > energy(k)) fp |= (1L << k)
      k += 1
    }
    fp
  }

  /** Documents-driven audio clip specs: rate 8k/16k by parity, 64..319
    * samples — the bounded per-row sample budget every audio query
    * inherits. `keep` reaches the parquet scan BELOW the opaque decode,
    * exactly like [[imageSpecs]]. */
  private def audioSpecs(spark: SparkSession, dir: String,
      keep: org.apache.spark.sql.Column): org.apache.spark.sql.Dataset[AudioSpec] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, 16000).otherwise(8000)
          .cast("int").as("rate"),
        (col("doc_id") % 256 + 64).cast("int").as("n"))
      .filter(keep)
      .as[AudioSpec]
  }

  /** (media_id, fp) energy-contour fingerprints of the documents-driven
    * clip set, each computed from REAL-parsed PCM (RIFF encode → chunk
    * walk → contour hash) — the audio twin of [[imageFingerprints]],
    * and like it the projection IS the production fingerprint table
    * serving paths persist and read back. */
  private def audioFingerprints(spark: SparkSession, dir: String,
      keep: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    audioSpecs(spark, dir, keep)
      .mapPartitions { it =>
        it.map(s => (s.media_id,
          audioFingerprint(encodeWav(s.media_id, s.n, s.rate))))
      }
      .toDF("media_id", "fp")
  }

  /** q_audio_fingerprint: perceptual-fingerprint census for the audio
    * modality — every clip RIFF-encoded, REAL-parsed, energy-contour
    * fingerprinted, then keep-first per fingerprint exactly like
    * q_image_dhash. Shuffle carries 8-byte fingerprints + counters,
    * never samples. */
  def audioFingerprintCensus(spark: SparkSession, dir: String): DataFrame =
    keepFirstCensus(audioFingerprints(spark, dir, lit(true)), "n_clips")

  /** q_audio_neardup: NEAR-duplicate clips — 0 < Hamming ≤ 3 between
    * energy-contour fingerprints — through the engine's ONE banding +
    * census body ([[nearDupCensus]], shared with q_image_neardup): the
    * 64-bit Manku 3-of-6-block keys over DISTINCT fingerprints, pair
    * volume recovered from group sizes. Contour diversity is law-
    * bounded (the clip law repeats with the sample/window grids), so
    * the brute-force oracle over distinct fingerprints is cheap while
    * the banded join is what runs at drive volume. */
  def audioNearDupCensus(spark: SparkSession, dir: String): DataFrame =
    nearDupCensus(audioFingerprints(spark, dir, lit(true)), "n_clip_pairs")

  /** q_audio_dedup_serve: the crawl-vs-history serve for the audio
    * modality, riding the same two shared bodies as the image twin —
    * history fingerprints PERSISTED to parquet inside the deferred
    * stage ([[persistedFingerprints]]) and read back, the batch
    * (media_id ≡ 0 mod 7) decoding only itself below the split. */
  def audioDedupServe(spark: SparkSession, dir: String): DataFrame =
    dedupServe(
      persistedFingerprints(spark, dir, "audfpidx",
        audioFingerprints(spark, dir, col("media_id") % 7 =!= 0)),
      audioFingerprints(spark, dir, col("media_id") % 7 === 0))

  /** The sample-law→fingerprint derivation (columns: media_id, fp)
    * shared by the audio fingerprint oracles via interpolation — the
    * [[fpLawSql]] convention, so the copies cannot drift. The law is
    * re-windowed with the same t·65/n mapping (empty windows densified
    * to zero via the range(65) left join — lead() over only the
    * non-empty windows would compare across gaps), bits packed with the
    * same sign convention as dHash. */
  private val audioFpLawSql: String =
    """m AS (
      |  SELECT doc_id AS media_id, (doc_id % 256) + 64 AS n
      |  FROM documents),
      |s AS (
      |  SELECT media_id, n, t.t AS t,
      |    ABS(((media_id * 104729 + t.t * 7919) % 65536) - 32768) AS amp
      |  FROM m CROSS JOIN range(320) t(t)
      |  WHERE t.t < n),
      |e0 AS (
      |  SELECT media_id, (t * 65) // n AS w, SUM(amp) AS e
      |  FROM s GROUP BY 1, 2),
      |e AS (
      |  SELECT m.media_id, w.w AS w, COALESCE(e0.e, 0) AS e
      |  FROM m CROSS JOIN range(65) w(w)
      |  LEFT JOIN e0 ON e0.media_id = m.media_id AND e0.w = w.w),
      |c AS (
      |  SELECT media_id, w, e,
      |    lead(e) OVER (PARTITION BY media_id ORDER BY w) AS en
      |  FROM e),
      |fp AS (
      |  SELECT media_id,
      |    CAST(SUM(CASE WHEN en > e THEN
      |      CASE WHEN w = 63 THEN (-9223372036854775807 - 1)
      |           ELSE (1::BIGINT << w) END
      |      ELSE 0 END) AS BIGINT) AS fp
      |  FROM c WHERE w < 64 GROUP BY media_id)""".stripMargin

  /** q_audio_fingerprint oracle: the shared fingerprint law + the
    * keep-first census. */
  val audioFingerprintOracle: String =
    s"""WITH $audioFpLawSql,
      |grp AS (
      |  SELECT fp, COUNT(*) AS n, MIN(media_id) AS kept
      |  FROM fp GROUP BY fp)
      |SELECT CAST(SUM(n) AS BIGINT) AS n_clips,
      |  COUNT(*) AS n_kept,
      |  CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dropped,
      |  CAST(MAX(n) AS BIGINT) AS max_group,
      |  CAST(SUM(((kept % 1000000007) + 1000000007) % 1000000007) AS BIGINT) AS kept_id_sum,
      |  CAST(SUM(((fp % 1000000007) + 1000000007) % 1000000007) AS BIGINT) AS fp_checksum
      |FROM grp""".stripMargin

  /** q_audio_neardup oracle: brute-force Hamming over the law-derived
    * DISTINCT fingerprints — the [[imageNearDupOracle]] frame on the
    * audio law, so the shared banding body is oracle-tested per
    * modality (BIGINT fingerprints before any xor — the HUGEINT
    * cross-sign trap). */
  val audioNearDupOracle: String =
    s"""WITH $audioFpLawSql,
      |grp AS (SELECT fp, COUNT(*) AS n FROM fp GROUP BY fp),
      |pairs AS (
      |  SELECT a.fp AS fp_a, b.fp AS fp_b, a.n AS na, b.n AS nb,
      |    bit_count(xor(a.fp, b.fp)) AS hamming
      |  FROM grp a JOIN grp b ON a.fp < b.fp
      |  WHERE bit_count(xor(a.fp, b.fp)) BETWEEN 1 AND 3)
      |SELECT COUNT(*) AS n_fp_pairs,
      |  CAST(SUM(na * nb) AS BIGINT) AS n_clip_pairs,
      |  CAST(SUM(CASE WHEN hamming = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
      |  CAST(SUM(CASE WHEN hamming = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
      |  CAST(SUM(CASE WHEN hamming = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
      |  CAST(SUM(((xor(fp_a, fp_b) % 1000000007) + 1000000007) % 1000000007)
      |    AS BIGINT) AS xor_checksum
      |FROM pairs""".stripMargin

  /** q_audio_dedup_serve oracle: same law-derived fingerprints, same
    * batch/history split, left join on the BIGINT fingerprint. */
  val audioDedupServeOracle: String =
    s"""WITH $audioFpLawSql,
      |hist AS (SELECT DISTINCT fp FROM fp WHERE media_id % 7 != 0)
      |SELECT COUNT(*) AS n_batch,
      |  CAST(SUM(CASE WHEN hist.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
      |  CAST(SUM(CASE WHEN hist.fp IS NULL
      |    THEN ((media_id % 1000000007) + 1000000007) % 1000000007 END)
      |    AS BIGINT) AS kept_id_sum,
      |  CAST(SUM(CASE WHEN hist.fp IS NULL
      |    THEN ((f.fp % 1000000007) + 1000000007) % 1000000007 END) AS BIGINT)
      |    AS new_fp_checksum
      |FROM fp f LEFT JOIN hist ON hist.fp = f.fp
      |WHERE f.media_id % 7 = 0""".stripMargin

  /** q_audio_decode: documents drive (media_id, rate, n) clip specs
    * (64..319 samples — bounded per-row cost); each spec encodes a real
    * RIFF/WAVE payload and REAL-parses it back partition-locally; the
    * census groups decoded amplitude stats by the DECODED sample rate
    * (two groups). Shuffles only the census rows. */
  def audioDecodeStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioSpecs(spark, dir, lit(true))
      .mapPartitions { it =>
        it.map(s => decodeWav(s.media_id, encodeWav(s.media_id, s.n, s.rate)))
      }
      .toDF()
      .groupBy(col("sample_rate").cast("long").as("sample_rate"))
      .agg(count(lit(1)).as("n_clips"),
        sum(col("n_samples")).as("n_samples"),
        sum(col("amp_sum")).as("amp_sum"),
        sum(col("amp_abs_sum")).as("amp_abs_sum"),
        min(col("amp_min")).cast("long").as("amp_min"),
        max(col("amp_max")).cast("long").as("amp_max"))
  }

  /** q_audio_resample: rate normalization as a REAL DSP pass — every
    * clip RIFF-encoded, parsed, linearly resampled to the OTHER rate
    * (16 kHz clips down to 8 kHz, 8 kHz clips up to 16 kHz — both
    * directions exercised), re-encoded, then REAL-parsed again and
    * censused by the DECODED output rate (the re-encoded header is
    * itself under test). The interpolation arithmetic is integer-exact
    * (unsigned weighted average), so the oracle replays it on the
    * sample law value-for-value — a resampler off-by-one, a rounding
    * drift, or a header slip all shift a sum. Scan-local like every
    * codec pass; shuffles only the 2-group census. */
  def audioResampleStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioSpecs(spark, dir, lit(true))
      .mapPartitions { it =>
        it.map { s =>
          val outRate = if (s.rate == 16000) 8000 else 16000
          decodeWav(s.media_id,
            resampleWav(s.media_id, encodeWav(s.media_id, s.n, s.rate), outRate))
        }
      }
      .toDF()
      .groupBy(col("sample_rate").cast("long").as("sample_rate"))
      .agg(count(lit(1)).as("n_clips"),
        sum(col("n_samples")).as("n_samples"),
        sum(col("amp_sum")).as("amp_sum"),
        sum(col("amp_abs_sum")).as("amp_abs_sum"),
        min(col("amp_min")).cast("long").as("amp_min"),
        max(col("amp_max")).cast("long").as("amp_max"))
  }

  /** q_audio_resample oracle: the law resampled arithmetically. The
    * 2:1 ratio makes every output either an exact source sample (down:
    * t = 2k; up even k: t = k/2) or the unsigned midpoint of two
    * neighbors (up odd k) — the raw law value (id·104729 + t·7919) mod
    * 65536 IS the unsigned sample, so the midpoint is their floor-mean
    * re-centered. Output length ⌊(n−1)·R2/R1⌋ + 1 mirrors the
    * resampler's endpoint convention. */
  val audioResampleOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS id,
      |    CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS rate,
      |    (doc_id % 256) + 64 AS n
      |  FROM documents),
      |o AS (
      |  SELECT id, rate, n,
      |    CASE WHEN rate = 16000 THEN 8000 ELSE 16000 END AS sample_rate,
      |    CASE WHEN rate = 16000 THEN (n - 1) // 2 + 1 ELSE 2 * n - 1 END AS n2
      |  FROM m),
      |s AS (
      |  SELECT id, sample_rate,
      |    CASE
      |      WHEN rate = 16000 THEN ((id*104729 + (2*k.k)*7919) % 65536) - 32768
      |      WHEN k.k % 2 = 0 THEN ((id*104729 + (k.k // 2)*7919) % 65536) - 32768
      |      ELSE (((id*104729 + (k.k // 2)*7919) % 65536)
      |          + ((id*104729 + (k.k // 2 + 1)*7919) % 65536)) // 2 - 32768
      |    END AS amp
      |  FROM o CROSS JOIN range(640) k(k) WHERE k.k < n2)
      |SELECT sample_rate, COUNT(DISTINCT id) AS n_clips, COUNT(*) AS n_samples,
      |  CAST(SUM(amp) AS BIGINT) AS amp_sum,
      |  CAST(SUM(ABS(amp)) AS BIGINT) AS amp_abs_sum,
      |  CAST(MIN(amp) AS BIGINT) AS amp_min,
      |  CAST(MAX(amp) AS BIGINT) AS amp_max
      |FROM s GROUP BY 1""".stripMargin

  /** q_audio_decode oracle: the sample law re-summed arithmetically. */
  val audioDecodeOracle: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS sample_rate,
      |    (doc_id % 256) + 64 AS n
      |  FROM documents),
      |s AS (
      |  SELECT media_id, sample_rate,
      |    ((media_id * 104729 + t.t * 7919) % 65536) - 32768 AS amp
      |  FROM m CROSS JOIN range(320) t(t)
      |  WHERE t.t < n)
      |SELECT sample_rate, COUNT(DISTINCT media_id) AS n_clips,
      |  COUNT(*) AS n_samples,
      |  CAST(SUM(amp) AS BIGINT) AS amp_sum,
      |  CAST(SUM(ABS(amp)) AS BIGINT) AS amp_abs_sum,
      |  CAST(MIN(amp) AS BIGINT) AS amp_min,
      |  CAST(MAX(amp) AS BIGINT) AS amp_max
      |FROM s GROUP BY 1""".stripMargin
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns next to typed metadata, and
  * decode/feature-extract runs as a partition-local typed transform.
  *
  * Decode status (r15): ALL THREE modalities decode for REAL — images
  * and audio in [[RealCodec]] (JDK ImageIO PNG/BMP/GIF/JPEG + a
  * RIFF/WAVE PCM parser), video in [[VideoCodec]] (a genuine AVI
  * container walk around DIB frames decoded through the JDK BMP codec)
  * — each oracle-checked end-to-end by q_image_decode / q_audio_decode
  * / q_video_decode. No modality is stubbed any more.
  * [[Multimodal.decodeStub]] remains ONLY as the codec-agnostic
  * ingest-edge demo (q_media_features): deterministic fake features
  * over arbitrary opaque payloads, standing where an external JNI /
  * `mapInArrow` model would plug in. What this file carries at 100 TB
  * is the plumbing around any codec: the schema (binary + metadata
  * struct), the `Dataset[T]` encoder plumbing, partition-local batch
  * processing via `mapPartitions` (one decoder init per partition, not
  * per record — the same reason the reference gives map functions
  * `configure`/`teardown` hooks,
  * `mapreduce/functions/map/MapFunction.h:42`), and size-aware
  * repartitioning so huge blobs don't skew partitions.
  */
object Multimodal {

  /** A media record: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  /** Extracted features (the decode stub's output). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      byte_histogram: Array[Long], // 16 buckets over the high nibble
      n_frames_sampled: Int)

  /** The ONE rolling payload checksum both stubs (and both oracle CTEs)
    * derive from: (cs·31 + byte) mod 1e9+7 over the raw bytes. */
  def payloadChecksum(content: Array[Byte]): Long = {
    var checksum = 0L
    var i = 0
    while (i < content.length) {
      checksum = (checksum * 31 + (content(i) & 0xff)) % 1000000007L
      i += 1
    }
    checksum
  }

  /** The decoder stub: a real pipeline would decode pixels / PCM here
    * (e.g. via a JNI codec or `mapInArrow` to a Python worker). The fake
    * is deterministic in the payload bytes so tests are stable. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < r.content.length) {
      val b = r.content(i) & 0xff
      hist(b >> 4) += 1
      i += 1
    }
    val checksum = payloadChecksum(r.content)
    // "frame sampling": one frame per 64-byte stride, as a real video
    // sampler would pull every k-th frame
    MediaFeatures(r.media_id, r.kind, r.content.length.toLong, checksum,
      hist, (r.content.length + 63) / 64)
  }

  /** Feature extraction over a media dataset. `mapPartitions` so decoder
    * state (here none; in a real pipeline the codec context) is built once
    * per partition and rows stream through in one pass. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map(decodeStub)
    }
  }

  /** Re-partition media so each task sees a bounded byte budget — blobs
    * are orders of magnitude bigger than their metadata, so row-count
    * partitioning under-utilizes or OOMs. Buckets records by cumulative
    * payload size ranges via a range partition on a size-derived key. */
  def repartitionBySize(media: Dataset[MediaRecord], targetPartitions: Int): Dataset[MediaRecord] =
    media.repartitionByRange(targetPartitions,
      length(col("content")).desc, col("media_id"))

  /** Build a synthetic media dataset from the documents table (the corpus
    * text bytes stand in for encoded payloads; kind/metadata derived
    * deterministically). This is the ingest-edge adapter a real pipeline
    * would replace with `spark.read.format("binaryFile")`. */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        (col("n_chars") % 64).cast("int").as("width"),
        (col("n_chars") % 48).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRecord]
  }

  /** Resize stub: nearest-neighbor resample of an image payload to
    * `out × out` bytes, treating the payload as a row-major square grid
    * (side = ⌈√len⌉) of 1-byte pixels. A real pipeline replaces the
    * per-pixel lookup with a codec resize; the part that matters at
    * scale is identical — a partition-local byte transform whose output
    * size is FIXED by the query (out² bytes/record no matter how large
    * the source blob), so downstream stages size deterministically. */
  def resizeStub(content: Array[Byte], out: Int): Array[Byte] = {
    // empty payload → out² zero pixels: the output size is the CONTRACT
    // (downstream stages size on it), so it holds for degenerate input too
    if (content.isEmpty) return new Array[Byte](out * out)
    val side = math.ceil(math.sqrt(content.length.toDouble)).toInt
    val res = new Array[Byte](out * out)
    var i = 0
    while (i < out) {
      var j = 0
      while (j < out) {
        val si = i * side / out
        val sj = j * side / out
        val idx = si * side + sj
        res(i * out + j) = content(if (idx < content.length) idx else content.length - 1)
        j += 1
      }
      i += 1
    }
    res
  }

  /** Resize over a media dataset — the same mapPartitions batch shape as
    * [[extractFeatures]] (codec context once per partition). */
  def resizeAll(media: Dataset[MediaRecord], out: Int): Dataset[(Long, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec/resampler init would go here
      it.map(r => (r.media_id, resizeStub(r.content, out)))
    }
  }

  /** Frame sampling as a relational explode: every 64-byte window of the
    * payload becomes a frame row (the every-k-th-frame pull of a video
    * sampler), sliced with codegen'd `substring` on the binary column —
    * no decoder in the loop, so the explode/slice plumbing is exactly
    * what a real pipeline wraps around its codec. Fan-out is
    * payload/stride rows per record at any scale, shuffles only at the
    * census. The payloads here are corpus text bytes, which also makes
    * the slicing DuckDB-mirrorable (q_frame_sample's oracle). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    fromDocuments(spark, dir).toDF()
      .select(col("media_id"), col("kind"), col("content"))
      .withColumn("frame_idx",
        explode(graft.queries.Qdsl.oracleCapped(
          expr("sequence(0, (length(content) - 1) DIV 64)"),
          512, "frame-sample frames")))
      .select(col("media_id"), col("kind"), col("frame_idx"),
        expr("substring(content, frame_idx * 64 + 1, 64)").cast("string").as("frame"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("frame")).as("n_distinct_frames"),
        max(col("frame_idx")).cast("long").as("max_frame_idx"),
        sum(graft.queries.Qdsl.hashMod(col("frame"))).as("frame_checksum"))

  /** An embedded media record: the model output plus the batch it rode
    * in on (batch telemetry is how inference pipelines debug stragglers). */
  case class EmbeddedMedia(
      media_id: Long,
      kind: String,
      embedding: Array[Float], // 8-dim stub
      batch_id: Long,
      batch_size: Int)

  /** Stubbed batch model: a real pipeline hands the WHOLE batch to an
    * ONNX/JNI session or a `mapInArrow` Python worker in one call — that
    * amortized dispatch is the entire point of batching. The stub derives
    * a deterministic 8-dim embedding from the payload's rolling checksum
    * (mirrorable in SQL, so the census is oracle-checkable). */
  def embedBatchStub(batch: Seq[MediaRecord]): Seq[Array[Float]] =
    batch.map { r =>
      val checksum = payloadChecksum(r.content)
      Array.tabulate(8)(j => ((checksum + j * 2654435761L) % 1000L) / 1000.0f)
    }

  /** Batched embedding inference: records group into fixed-size batches
    * WITHIN each partition (`grouped(batchSize)` over the row iterator —
    * no shuffle, no materialized partition), each batch goes through the
    * model in one call, and rows flatten back out tagged with their
    * batch. Combine with [[repartitionBySize]] first so byte-heavy blobs
    * don't starve batches. This is the exact plumbing an embedding
    * backfill over a 100 TB corpus runs — the stub swaps for a real
    * model without touching the dataflow. */
  def embedAll(media: Dataset[MediaRecord], batchSize: Int): Dataset[EmbeddedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // model session init would go here, once per partition
      var batchId = -1L
      it.grouped(batchSize).flatMap { batch =>
        batchId += 1
        embedBatchStub(batch).lazyZip(batch).map { (emb, r) =>
          EmbeddedMedia(r.media_id, r.kind, emb, batchId, batch.size)
        }
      }
    }
  }

  /** Census over the batched-inference output: per kind, the record
    * count and the integer-exact checksum of the (milli-scaled) embedding
    * coordinates — deterministic regardless of partitioning/batching, so
    * the oracle re-derives it from the payload bytes; batch SHAPES are
    * partitioning-dependent and asserted in MultimodalSpec instead. */
  def embedBatchStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    embedAll(fromDocuments(spark, dir), batchSize = 32)
      .select(col("media_id"), col("kind"),
        expr("aggregate(transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)), CAST(0 AS BIGINT), (a, e) -> a + e)")
          .as("emb_milli_sum"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("emb_milli_sum")).as("emb_checksum"))
  }

  /** Summary query over extracted features (registered as a rows-only
    * driver check — binary decode is not SQL-expressible in the oracle). */
  def mediaFeatureStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(fromDocuments(spark, dir))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("checksum") % 1000000007L).as("checksum"),
        sum(col("n_frames_sampled").cast("long")).as("n_frames"))
  }
}

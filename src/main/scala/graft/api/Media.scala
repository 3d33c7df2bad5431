package graft.api

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{RealCodec, VideoCodec}

/** The PAYLOAD-driven media library surface — what a user points at a
  * real corpus of opaque `binary` columns (a `binaryFile` read, a crawl
  * table), as opposed to the law-driven oracle queries that pin the
  * codecs themselves. The [[Corpus]]/`Vectors` facade stance: every
  * method delegates to the SAME shared bodies the oracle-checked
  * queries census (`RealCodec.keepFirstCensus` / `nearDupCensus` /
  * `dedupServe`; `RealCodec.dHash` / `audioFingerprint`;
  * `VideoCodec.walkAvi`), so the library path cannot drift from the
  * verified one.
  *
  * Quarantine contract: a corrupt payload in a 100 TB corpus must
  * never kill the job — decode failures surface as a NULL fingerprint
  * (with the row preserved, so `decodeCensus`-style accounting stays
  * possible), and every census/serve entry point filters nulls before
  * aggregating. The oracle queries keep their loud-failure stance
  * (their payloads are law-derived, always valid); the boundary where
  * external bytes enter is exactly here.
  *
  * Scale shape: decode + fingerprint are scan-local per payload;
  * everything downstream shuffles 8-byte fingerprints and counters,
  * never payload bytes — identical to the oracle queries' plans.
  */
object Media {

  /** (id, fp) perceptual dHash fingerprints over real image payloads
    * (any format the JDK sniffs: PNG/BMP/GIF/JPEG). Corrupt or
    * unrecognized payloads yield fp = NULL. */
  def imageFingerprints(media: DataFrame, id: String = "media_id",
      bytes: String = "content"): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(id).cast("long"), col(bytes).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (mid, payload) =>
          val fp = try {
            val img = ImageIO.read(new ByteArrayInputStream(payload))
            if (img == null) None else Some(RealCodec.dHash(img))
          } catch { case _: Exception => None }
          (mid, fp)
        }
      }
      .toDF("media_id", "fp")
      .withColumnRenamed("media_id", id)
  }

  /** (id, fp) energy-contour fingerprints over real RIFF/WAVE payloads.
    * Corrupt/truncated/non-PCM payloads yield fp = NULL. */
  def audioFingerprints(media: DataFrame, id: String = "media_id",
      bytes: String = "content"): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(id).cast("long"), col(bytes).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (mid, payload) =>
          (mid, try Some(RealCodec.audioFingerprint(payload))
            catch { case _: Exception => None })
        }
      }
      .toDF("media_id", "fp")
      .withColumnRenamed("media_id", id)
  }

  /** (id, frame_idx, fp) per-frame dHash fingerprints over real AVI
    * payloads — BOTH container profiles decode (DIB frames re-framed
    * through the JDK BMP codec; MJPEG frames are standalone JPEGs). A
    * corrupt container yields one (id, -1, NULL) quarantine row; a
    * frame the codec rejects yields (id, frame_idx, NULL). */
  def videoFrameFingerprints(media: DataFrame, id: String = "media_id",
      bytes: String = "content"): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col(id).cast("long"), col(bytes).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (mid, payload) =>
          try {
            val parsed = VideoCodec.walkAvi(payload)
            parsed.frames.iterator.zipWithIndex.map { case (bits, f) =>
              val imgBytes =
                if (parsed.codec == "DIB ")
                  VideoCodec.frameToBmp(parsed.w, parsed.h, bits)
                else bits // MJPEG: the chunk IS a standalone JPEG
              val fp = try {
                val img = ImageIO.read(new ByteArrayInputStream(imgBytes))
                if (img == null) None else Some(RealCodec.dHash(img))
              } catch { case _: Exception => None }
              (mid, f, fp)
            }.toSeq
          } catch {
            case _: Exception => Seq((mid, -1, Option.empty[Long]))
          }
        }
      }
      .toDF("media_id", "frame_idx", "fp")
      .withColumnRenamed("media_id", id)
  }

  /** Keep-first dedup census over a fingerprint frame from any of the
    * extractors above — the q_image_dhash/q_audio_fingerprint body;
    * NULL (quarantined) fingerprints are excluded before grouping. */
  def dedupCensus(fps: DataFrame, id: String = "media_id",
      countAlias: String = "n_media"): DataFrame =
    RealCodec.keepFirstCensus(
      fps.filter(col("fp").isNotNull)
        .select(col(id).cast("long").as("media_id"), col("fp")),
      countAlias)

  /** Banded near-dup census (0 < Hamming ≤ 3) — the shared
    * q_image_neardup/q_audio_neardup body over DISTINCT fingerprints. */
  def nearDupCensus(fps: DataFrame,
      pairAlias: String = "n_media_pairs"): DataFrame =
    RealCodec.nearDupCensus(fps.filter(col("fp").isNotNull), pairAlias)

  /** Consecutive-frame perceptual-distance distribution over a
    * [[videoFrameFingerprints]] frame — the q_video_scenes body: the
    * caller reads the distribution and places its scene-cut threshold
    * at the valley. Quarantine rows (NULL fp / frame_idx −1) are
    * excluded; windows partition per video over bounded frame counts. */
  def frameContinuity(fps: DataFrame,
      id: String = "media_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("vid")).orderBy(col("frame_idx"))
    fps.filter(col("fp").isNotNull && col("frame_idx") >= 0)
      .select(col(id).cast("long").as("vid"), col("frame_idx"), col("fp"))
      .withColumn("fpn", lead(col("fp"), 1).over(w))
      .filter(col("fpn").isNotNull)
      .select(col("vid"),
        expr("bit_count(fp ^ fpn)").cast("long").as("hamming"))
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("vid")).as("n_videos"))
  }

  /** Crawl-vs-history serve: the batch censused against a history
    * fingerprint table (typically the persisted (id, fp) parquet the
    * extractors produce) — the q_*_dedup_serve body. */
  def serveAgainstHistory(batch: DataFrame, history: DataFrame,
      id: String = "media_id"): DataFrame =
    RealCodec.dedupServe(
      history.filter(col("fp").isNotNull),
      batch.filter(col("fp").isNotNull)
        .select(col(id).cast("long").as("media_id"), col("fp")))
}

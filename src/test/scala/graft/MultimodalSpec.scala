package graft

import graft.operators.Multimodal

/** Plumbing checks for the multimodal column pipeline (decode is a
  * documented stub; schema/partitioning/batch shape are real). */
class MultimodalSpec extends SparkSpec {

  test("feature extraction is deterministic in payload bytes") {
    val r1 = Multimodal.MediaRecord(1L, "image", "hello world".getBytes("UTF-8"), 3, 2, 0)
    val f1 = Multimodal.decodeStub(r1)
    val f2 = Multimodal.decodeStub(r1.copy(media_id = 2L))
    assert(f1.checksum === f2.checksum, "checksum depends only on bytes")
    assert(f1.n_bytes === 11L)
    assert(f1.byte_histogram.sum === 11L, "every byte lands in one bucket")
    assert(f1.n_frames_sampled === 1)
  }

  test("end-to-end extraction over the documents-backed media set") {
    val media = Multimodal.fromDocuments(spark, sfDir)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(f => Set("image", "audio", "video")(f.kind)))
    assert(feats.forall(f => f.byte_histogram.sum === f.n_bytes))
    val stats = Multimodal.mediaFeatureStats(spark, sfDir).collect()
    assert(stats.map(_.getLong(1)).sum === feats.length)
  }

  test("size repartitioning preserves every record") {
    val media = Multimodal.fromDocuments(spark, sfDir)
    val repart = Multimodal.repartitionBySize(media, 3)
    assert(repart.count() === media.count())
    assert(repart.rdd.getNumPartitions === 3)
  }
}

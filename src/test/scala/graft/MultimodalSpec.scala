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

  test("resize emits fixed-size output with corner-preserving sampling") {
    val src = (0 until 100).map(_.toByte).toArray // 10x10 grid
    val out = Multimodal.resizeStub(src, 4)
    assert(out.length == 16, "output size is query-fixed, not input-sized")
    assert(out(0) == src(0), "top-left pixel preserved")
    // nearest-neighbor: out pixel (1,1) samples src(1*10/4, 1*10/4) = (2,2)
    assert(out(5) == src(2 * 10 + 2))
    // fixed-size contract holds even for degenerate input (zero pixels)
    val empty = Multimodal.resizeStub(Array.empty[Byte], 4)
    assert(empty.length == 16 && empty.forall(_ == 0))
    // distributed form preserves cardinality and output shape
    val media = Multimodal.fromDocuments(spark, sfDir)
    val resized = Multimodal.resizeAll(media, 8)
    assert(resized.count() == media.count())
    import spark.implicits._
    assert(resized.map(_._2.length).distinct().collect().toSeq == Seq(64))
  }

  test("batched inference covers every record in bounded contiguous batches") {
    import spark.implicits._
    val media = Multimodal.fromDocuments(spark, sfDir)
    val n = media.count()
    val out = Multimodal.embedAll(media.repartition(3), batchSize = 32).persist()
    try {
      // every record embedded exactly once, 8-dim output contract
      assert(out.count() == n)
      assert(out.map(_.embedding.length).distinct().collect().toSeq == Seq(8))
      // within every PARTITION, each tagged (batch_id, batch_size) group
      // must hold exactly batch_size rows and stay under the bound —
      // checked partition-locally so shared batch ids across partitions
      // cannot mask a wrong tag
      val shapeViolations = out.mapPartitions { it =>
        val groups = it.toSeq.groupBy(e => (e.batch_id, e.batch_size))
        Iterator(groups.count { case ((_, declared), rows) =>
          declared > 32 || rows.size != declared
        })
      }.collect().sum
      assert(shapeViolations == 0,
        s"$shapeViolations batches with wrong or over-bound batch_size tags")
      // embeddings are a pure function of the payload: re-running with a
      // different partitioning yields the identical per-record embedding
      val again = Multimodal.embedAll(media.repartition(7), batchSize = 8)
        .map(e => (e.media_id, e.embedding.toSeq)).collect().toMap
      val first = out.map(e => (e.media_id, e.embedding.toSeq)).collect().toMap
      assert(first == again,
        "embedding depends on batching/partitioning — model stub impure")
    } finally out.unpersist()
  }

  test("census math is octet-exact on non-ASCII, newline-bearing payloads") {
    import spark.implicits._
    // multi-byte UTF-8 (accents, CJK, emoji) and embedded newlines: the
    // payload octets differ from the code points, so any code-point or
    // regexp shortcut in the census (the pre-r7 oracle divergence)
    // produces a different checksum here
    val texts = Seq(
      "héllo wörld — Dünya 🌍 café\nnaïve emoji 🚀 line",
      "日本語のテキストと中文混在、改行も\nあり。München Zürich",
      "plain ascii control row")
    val dir = java.nio.file.Files.createTempDirectory("graft_nonascii_").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "xx", "fixture", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    def kindOf(id: Long) = Seq("image", "audio", "video")((id % 3).toInt)
    val expected = texts.zipWithIndex.map { case (t, i) =>
      val bytes = t.getBytes("UTF-8")
      (i.toLong, kindOf(i.toLong), bytes.length.toLong,
        Multimodal.payloadChecksum(bytes))
    }

    val feats = Multimodal.mediaFeatureStats(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val expFeats = expected.groupBy(_._2).map { case (kind, rows) =>
      kind -> ((rows.size.toLong, rows.map(_._3).sum,
        rows.map(_._4 % 1000000007L).sum, rows.map(r => (r._3 + 63) / 64).sum))
    }
    assert(feats === expFeats,
      "media census must fold UTF-8 octets, not code points")

    val emb = Multimodal.embedBatchStats(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expEmb = expected.groupBy(_._2).map { case (kind, rows) =>
      kind -> ((rows.size.toLong, rows.map { r =>
        (0 until 8).map(j => (r._4 + j * 2654435761L) % 1000L).sum
      }.sum))
    }
    assert(emb === expEmb,
      "embedding census must derive from the octet checksum")
  }

  test("size repartitioning preserves every record") {
    val media = Multimodal.fromDocuments(spark, sfDir)
    val repart = Multimodal.repartitionBySize(media, 3)
    assert(repart.count() === media.count())
    assert(repart.rdd.getNumPartitions === 3)
  }
}

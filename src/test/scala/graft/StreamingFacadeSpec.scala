package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming parity for the corpus-relative Corpus facades.
  *
  * [[graft.api.Corpus.classifierLogit]] is scan-local, so it compiles
  * into a streaming plan directly (StreamingDedupSpec). substringSpans
  * and shardManifest are CORPUS-RELATIVE — window recurrence is a count
  * over the corpus, shard offsets are a prefix sum over the corpus — so
  * "run it on a stream" requires choosing the corpus scope, and the
  * idiomatic Spark scope is the micro-batch via `foreachBatch` (their
  * plans contain agg-then-join and unbounded window stacks that
  * Structured Streaming cannot express incrementally). These specs prove
  * the SAME facade call, unchanged, drives each micro-batch and agrees
  * with the batch call on identical data — and that recurrence state is
  * per-batch, never leaked across batches.
  */
class StreamingFacadeSpec extends SparkSpec {

  // 16-token window machinery needs >= 16-token docs; two docs sharing
  // this exact sentence own one recurring window per shared position
  private val shared = (1 to 20).map(i => s"tok$i").mkString(" ")
  private val unique = (1 to 20).map(i => s"only$i").mkString(" ")

  test("substringSpans drives micro-batches unchanged via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val seen = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = input.toDF().toDF("my_id", "body").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= graft.api.Corpus
            .substringSpans(batch, id = "my_id", text = "body")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try {
      val batch1 = Seq((1L, shared), (2L, shared), (3L, unique))
      input.addData(batch1: _*)
      q.processAllAvailable()
      val expect = graft.api.Corpus
        .substringSpans(batch1.toDF("my_id", "body"), id = "my_id", text = "body")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(seen.synchronized(seen.toSet) == expect,
        s"stream and batch span stats diverged: $seen vs $expect")
      assert(expect.map(_._1) == Set(1L, 2L), "only the shared-window docs flagged")

      // doc 4 repeats batch 1's shared sentence, but arrives in a LATER
      // batch: recurrence scope is the micro-batch, so it must NOT be
      // flagged — no recurrence state leaks across batches
      input.addData((4L, shared))
      q.processAllAvailable()
      assert(!seen.synchronized(seen.exists(_._1 == 4L)),
        "cross-batch recurrence must not be counted in per-batch scope")
    } finally q.stop()
  }

  test("shardManifest drives micro-batches unchanged via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val seen = mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val q = input.toDF().toDF("my_id", "body").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= graft.api.Corpus
            .shardManifest(batch, id = "my_id", text = "body", shards = 4)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        }
        ()
      }
      .start()
    try {
      val batch1 = (1L to 12L).map(i => (i, s"doc $i has exactly seven words total"))
      input.addData(batch1: _*)
      q.processAllAvailable()
      val expect = graft.api.Corpus
        .shardManifest(batch1.toDF("my_id", "body"), id = "my_id",
          text = "body", shards = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(seen.synchronized(seen.toSet) == expect,
        "stream and batch manifests diverged")
      // manifest invariants survive the streaming drive: offsets are an
      // exclusive prefix sum of token counts within each shard
      val byShard = seen.synchronized(seen.toVector).groupBy(_._2)
      byShard.foreach { case (_, rows) =>
        val inOrder = rows.sortBy(_._4)
        inOrder.foldLeft(0L) { (expectOff, r) =>
          assert(r._4 == expectOff, s"offset gap in shard ${r._2}: $r")
          expectOff + r._3
        }
      }
    } finally q.stop()
  }

  test("dedupRewrite drives micro-batches unchanged via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val seen = mutable.ArrayBuffer.empty[(Long, String)]
    val q = input.toDF().toDF("my_id", "body").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= graft.api.Corpus
            .dedupRewrite(batch, id = "my_id", text = "body")
            .collect().map(r => (r.getLong(0), r.getString(3)))
        }
        ()
      }
      .start()
    try {
      val batch1 = Seq((1L, shared), (2L, shared), (3L, unique))
      input.addData(batch1: _*)
      q.processAllAvailable()
      val expect = graft.api.Corpus
        .dedupRewrite(batch1.toDF("my_id", "body"), id = "my_id", text = "body")
        .collect().map(r => (r.getLong(0), r.getString(3))).toSet
      assert(seen.synchronized(seen.toSet) == expect,
        s"stream and batch rewrites diverged: $seen vs $expect")
      // doc 2 duplicated doc 1 chunk-for-chunk inside the batch -> vanished
      assert(!expect.exists(_._1 == 2L) && expect.exists(_._1 == 1L))

      // keep-first scope is the micro-batch: the same text in a LATER
      // batch survives whole — no first-occurrence state leaks forward
      input.addData((4L, shared))
      q.processAllAvailable()
      val doc4 = seen.synchronized(seen.find(_._1 == 4L))
      assert(doc4.exists(_._2 == shared),
        s"cross-batch keep-first must not drop later batches: $doc4")
    } finally q.stop()
  }

  test("perplexityBuckets drives micro-batches unchanged via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val seen = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = input.toDF().toDF("my_id", "body").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= graft.api.Corpus
            .perplexityBuckets(batch, id = "my_id", text = "body", k = 2)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try {
      val batch1 = (1L to 8L).map(i =>
        (i, if (i % 2 == 0) "common common common words here"
            else s"rare$i unique$i singleton$i tokens$i here"))
      input.addData(batch1: _*)
      q.processAllAvailable()
      val expect = graft.api.Corpus
        .perplexityBuckets(batch1.toDF("my_id", "body"), id = "my_id",
          text = "body", k = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(seen.synchronized(seen.toSet) == expect,
        "stream and batch buckets diverged")
      // rare-token docs sink to the low half, common-token docs rise
      val byDoc = expect.map(e => e._1 -> e._3).toMap
      assert((1L to 8L).forall(i => byDoc(i) == (if (i % 2 == 0) 1L else 0L)),
        s"bucket assignment drifted: $byDoc")
    } finally q.stop()
  }

  test("driftCensus monitors arriving micro-batches against static history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val history = Seq((1L, "en", "the cat sat"), (2L, "en", "the dog ran"),
      (3L, "de", "der hund und")).toDF("id", "language", "body")
      .select(org.apache.spark.sql.functions.col("language"),
        org.apache.spark.sql.functions.col("body"))

    val input = MemoryStream[(Long, String, String)]
    val seen = mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
    val q = input.toDF().toDF("id", "language", "body").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= graft.api.Corpus
            .driftCensus(history, batch, group = "language", text = "body")
            .collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
        }
        ()
      }
      .start()
    try {
      // an all-English batch: the en share jumps 667‰ -> 1000‰
      input.addData((10L, "en", "the bird flew"), (11L, "en", "the fish swam"))
      q.processAllAvailable()
      val got = seen.synchronized(seen.toList)
      val en = got.find(_._1 == "en").get
      val de = got.find(_._1 == "de").get
      assert(en == (("en", 2L, 2L, 334L)), s"en drift row: $en") // 1000-666
      assert(de == (("de", 1L, 0L, -333L)), s"de drift row: $de") // 0-333
    } finally q.stop()
  }

  test("dedupAgainstIndex serves a document stream against a static index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the index is built ONCE from history and reused by every
    // micro-batch — the crawl-frontier deployment: static history, an
    // unbounded stream of arriving documents
    val history = Seq((1L, shared), (2L, unique)).toDF("my_id", "body")
    val idx = graft.api.Corpus.minhashIndex(history, id = "my_id", text = "body")

    val input = MemoryStream[(Long, String)]
    val seen = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = input.toDF().toDF("my_id", "body").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= graft.api.Corpus
            .dedupAgainstIndex(idx, batch, id = "my_id", text = "body")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        }
        ()
      }
      .start()
    try {
      // batch 1: a dup of history doc 1 and a novel doc
      input.addData((10L, shared), (11L, "a crawl result with fresh words"))
      q.processAllAvailable()
      // batch 2: a dup of history doc 2 — SEPARATE micro-batch, same index
      input.addData((12L, unique))
      q.processAllAvailable()
      val got = seen.synchronized(seen.toSet)
      val expect = graft.api.Corpus
        .dedupAgainstIndex(idx,
          Seq((10L, shared), (11L, "a crawl result with fresh words"),
            (12L, unique)).toDF("my_id", "body"),
          id = "my_id", text = "body")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      graft.core.Caches.release()
      // the serve join is stateless per batch, so the union over
      // micro-batches IS the batch answer on the union of the data
      assert(got == expect, s"stream and batch serves diverged: $got vs $expect")
      assert(got.contains((1L, 10L, 8L)), "history dup not flagged from stream")
      assert(got.contains((2L, 12L, 8L)), "second-batch dup not flagged")
      assert(!got.exists(_._2 == 11L), "novel doc must not pair")
    } finally q.stop()
  }
}

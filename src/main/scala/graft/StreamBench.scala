package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.RealCodec
import graft.streaming.Sessions

/** Streaming-throughput telemetry for the bench JSON (r15 ask): every
  * streaming surface is correctness-spec'd, but no round recorded a
  * RATE — a state-store or quarantine-filter regression could halve
  * ingest throughput while every spec stays green. Two representative
  * surfaces, driven from MemoryStreams at corpus-proportional volume:
  *
  *   - [[RealCodec.fingerprintStream]] — the expensive shape: REAL
  *     decode + dHash inside the stream, watermarked keep-first state;
  *   - [[Sessions.dedupStream]] — the cheap shape: pure watermarked
  *     dedup state, measuring engine+state-store overhead per row.
  *
  * Rows arrive in 4 micro-batch cycles (addData → processAllAvailable)
  * so cross-batch state is genuinely exercised, not one giant batch.
  * Reported as rows/s, UNGATED initially — the value is the
  * round-over-round trend line, like the weather probe's first round. */
object StreamBench {

  /** Event-time floor at minute 1: Spark's initial watermark is the
    * epoch, so an event-time-0 row is born expired and silently dropped
    * (the StreamingMediaSpec fixture discipline). */
  private def ts(i: Long): Timestamp = new Timestamp((i / 1000 + 1) * 60000L)

  private def rmrf(p: java.io.File): Unit = {
    val kids = p.listFiles()
    if (kids != null) kids.foreach(rmrf)
    p.delete(); ()
  }

  private def drive[A](nRows: Long, addBatch: (Long, Long) => Unit,
      start: () => org.apache.spark.sql.streaming.StreamingQuery): Double = {
    val q = start()
    try {
      val t0 = System.nanoTime()
      val cycles = 4
      val per = (nRows + cycles - 1) / cycles
      var fed = 0L
      while (fed < nRows) {
        val hi = math.min(fed + per, nRows)
        addBatch(fed, hi)
        q.processAllAvailable()
        fed = hi
      }
      nRows / ((System.nanoTime() - t0) / 1e9)
    } finally q.stop()
  }

  /** rows/s of the in-stream decode+dedup surface at `nRows` image
    * specs (ids walk the 16128-wide perceptual law, so the dedup state
    * sees genuine cross-batch collisions). */
  def fingerprintRate(spark: SparkSession, nRows: Long): Double = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Int, Int, Timestamp)]
    val out = RealCodec.fingerprintStream(
      input.toDF().toDF("media_id", "w", "h", "ts"), "10 minutes")
    val ck = java.nio.file.Files.createTempDirectory("graft_sbench_fp").toString
    try drive(nRows,
      (lo, hi) => { input.addData((lo until hi).map { i =>
        (i, (i % 9 + 8).toInt, (i % 7 + 8).toInt, ts(i))
      }); () },
      () => out.writeStream.format("noop")
        .option("checkpointLocation", ck).outputMode("append").start())
    finally rmrf(new java.io.File(ck))
  }

  /** rows/s of the pure watermarked-dedup surface at `nRows` events
    * (every 3rd row is a key duplicate, so state suppression runs). */
  def dedupRate(spark: SparkSession, nRows: Long): Double = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = Sessions.dedupStream(
      input.toDF().toDF("event_id", "ts"), "10 minutes", Seq("event_id"))
    val ck = java.nio.file.Files.createTempDirectory("graft_sbench_dd").toString
    try drive(nRows,
      (lo, hi) => { input.addData((lo until hi).map(i =>
        (i / 3 * 2, ts(i)))); () },
      () => out.writeStream.format("noop")
        .option("checkpointLocation", ck).outputMode("append").start())
    finally rmrf(new java.io.File(ck))
  }

  /** Both rates, sized from the corpus count the caller already holds
    * (the simhashTuned hoisting stance); decode rows are capped so the
    * expensive surface stays a telemetry leg, not a second benchmark. */
  def summary(spark: SparkSession, nDocs: Long): Map[String, Double] = {
    val decodeRows = math.min(math.max(nDocs, 1000L), 24000L)
    val dedupRows = math.min(math.max(nDocs * 2, 4000L), 96000L)
    Map("fingerprint_rows_s" -> fingerprintRate(spark, decodeRows),
      "dedup_rows_s" -> dedupRate(spark, dedupRows))
  }
}

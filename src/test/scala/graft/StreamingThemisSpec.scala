package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.ThemisSessions

/** Streaming span-based sessionization must agree with the batch
  * sorted-group implementation over the same events once the watermark
  * passes every session's horizon. */
class StreamingThemisSpec extends SparkSpec {

  private val H = 3600000L // 1h session span threshold

  // day-1 base: an event at exactly the initial watermark (epoch 0) is
  // treated as late and dropped, so keep test times strictly above it
  private val B = 86400000L
  private def ts(min: Long): Timestamp = new Timestamp(B + min * 60000L)

  test("flatMapGroupsWithState sessions match the batch span rule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // user 1: events at 0,10,59 (one session: 59 < 60 span), then 61 and
    //         130 — 61 starts session 2 (61 >= 60 from start 0); 130
    //         starts session 3 (130-61 >= 60)
    // user 2: single event
    val events = Seq(
      (1L, ts(0), "a"), (1L, ts(10), "b"), (1L, ts(59), "c"),
      (1L, ts(61), "d"), (1L, ts(130), "e"),
      (2L, ts(5), "z"))

    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = ThemisSessions.sessionizeStream(
      input.toDF().toDF("user_id", "ts", "event_type"), H, "0 seconds")
    val q = stream.writeStream.format("memory")
      .queryName("themis_sess").outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far past every session horizon so open
      // sessions time out (two batches: one to raise the max event time,
      // one to act on the new watermark)
      input.addData((99L, ts(100000), "w"))
      q.processAllAvailable()
      input.addData((99L, ts(100001), "w"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("themis_sess")
      .filter($"user_id" < 99)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSet

    val expected = Set(
      (1L, B, B + 59L * 60000, 3L, "a", "c"),
      (1L, B + 61L * 60000, B + 61L * 60000, 1L, "d", "d"),
      (1L, B + 130L * 60000, B + 130L * 60000, 1L, "e", "e"),
      (2L, B + 5L * 60000, B + 5L * 60000, 1L, "z", "z"))
    assert(got === expected)
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Sessions

/** Stream-stream interval join: two live feeds joined on key + bounded
  * event-time distance must emit exactly the pairs the equivalent batch
  * join produces — matches within the window, across micro-batch
  * boundaries in either arrival order, and nothing outside the window.
  */
class StreamingJoinSpec extends SparkSpec {

  // base offset keeps every event time strictly above the initial
  // watermark (epoch 0) — a row AT the watermark is droppable as late
  private def ts(min: Long): Timestamp = new Timestamp((1000 + min) * 60000L)
  private val WindowMs = 10 * 60000L // 10 minutes

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = Sessions.intervalJoinStreams(
      clicks.toDF().toDF("user_id", "ts", "value"),
      purchases.toDF().toDF("user_id", "ts", "value"),
      lateness = "30 minutes", windowMs = WindowMs)
    val q = joined.writeStream.format("memory")
      .queryName("sj_test").outputMode("append").start()
    try {
      // batch 1: user 1 clicks at t=0 and t=8; user 2 clicks at t=0
      clicks.addData((1L, ts(0), 0.1), (1L, ts(8), 0.2), (2L, ts(0), 0.3))
      q.processAllAvailable()
      // batch 2 (later micro-batch — the join must buffer across):
      //   user 1 purchases at t=9  -> matches BOTH clicks (0 and 8)
      //   user 2 purchases at t=15 -> click at t=0 is 15 min old: NO match
      //   user 3 purchases at t=5  -> no click at all: NO match
      purchases.addData((1L, ts(9), 9.9), (2L, ts(15), 5.5), (3L, ts(5), 1.1))
      q.processAllAvailable()
      // batch 3: a click ARRIVING after the purchase it matches (out of
      // order within the watermark) — user 4 purchase first, click after
      purchases.addData((4L, ts(20), 7.7))
      q.processAllAvailable()
      clicks.addData((4L, ts(14), 0.4))
      q.processAllAvailable()

      val got = spark.table("sj_test")
        .select(col("user_id"), col("purchase_value"), col("click_value"))
      val want = Seq(
        (1L, 9.9, 0.1), (1L, 9.9, 0.2), // both in-window clicks
        (4L, 7.7, 0.4)                  // out-of-order arrival still joins
      ).toDF("user_id", "purchase_value", "click_value")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"stream-stream join diverged: got ${got.collect().mkString(",")}")
    } finally q.stop()
  }

  test("watermark passage evicts buffered join state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val joined = Sessions.intervalJoinStreams(
      clicks.toDF().toDF("user_id", "ts", "value"),
      purchases.toDF().toDF("user_id", "ts", "value"),
      lateness = "5 minutes", windowMs = WindowMs)
    val q = joined.writeStream.format("memory")
      .queryName("sj_evict_test").outputMode("append").start()
    try {
      // seed both sides with early-time rows that get buffered
      clicks.addData((1 to 50).map(i => (i.toLong, ts(0), 1.0)): _*)
      purchases.addData((100L, ts(0), 1.0))
      q.processAllAvailable()
      val peak = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(peak >= 50, s"expected the early rows buffered, state=$peak")
      // advance event time far past lateness + join window on BOTH sides
      // (the watermark is the min across inputs), then run two batches —
      // eviction applies the batch after the watermark update
      clicks.addData((999L, ts(600), 1.0))
      purchases.addData((998L, ts(600), 1.0))
      q.processAllAvailable()
      clicks.addData((997L, ts(601), 1.0))
      purchases.addData((996L, ts(601), 1.0))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(after < peak,
        s"watermark advance did not evict buffered rows: $peak -> $after")
    } finally q.stop()
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Sessions

/** Structured Streaming parity: the streaming transforms are the same
  * DataFrame definitions as the batch queries, so a MemoryStream run must
  * agree with the batch run over identical input. */
class StreamingSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("streaming gap sessionization matches batch on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(5), 2.0), (1L, ts(500), 3.0),
      (2L, ts(10), 4.0))

    val input = MemoryStream[(Long, Timestamp, Double)]
    input.addData(events: _*)
    val stream = Sessions.sessionizeStream(
      input.toDF().toDF("user_id", "ts", "value"), "1 hour", "0 seconds")
    val q = stream.writeStream.format("memory")
      .queryName("sess_test").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sess_test")
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = Sessions.sessionize(
      events.toDF("user_id", "ts", "value"), "1 hour")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.size === 3, "user 1 splits into two sessions, user 2 one")
  }

  test("file-source events stream sessionizes like the batch table") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("events_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val stream = Sessions.sessionizeStream(
      Sessions.eventsStream(spark, dir.toString)
        .select("user_id", "ts", "value"), "6 hours", "0 seconds")
    val q = stream.writeStream.format("memory")
      .queryName("file_sess").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("file_sess").collect().map(_.toSeq).toSet

    val batch = Sessions.sessionize(
      graft.core.Tables.events(spark, sfDir)
        .select("user_id", "ts", "value"), "6 hours")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming word count emits windowed counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    input.addData((ts(0), "spark sort merge"), (ts(1), "sort merge"), (ts(90), "sort"))
    val q = Sessions.wordCountStream(
        input.toDF().toDF("ts", "text"), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("wc_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val counts = spark.table("wc_test")
      .groupBy("word").agg(sum("cnt").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("spark" -> 1L, "sort" -> 3L, "merge" -> 2L))
  }
}

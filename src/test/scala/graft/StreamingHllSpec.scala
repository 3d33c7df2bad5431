package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SketchStream

/** Streaming HLL registers must equal the batch registers over the same
  * events — including under out-of-order delivery, the property that
  * makes max-register sketches the right streaming distinct state.
  */
class StreamingHllSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("streamed registers equal batch registers, even out of order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two 1-hour windows, events delivered out of order across batches
    val events = Seq(
      (ts(10), "click", 1L), (ts(20), "click", 2L), (ts(75), "click", 3L),
      (ts(5), "view", 4L), (ts(40), "click", 5L), (ts(70), "view", 1L))

    val input = MemoryStream[(Timestamp, String, Long)]
    val stream = SketchStream.hllRegistersStream(
      input.toDF().toDF("ts", "event_type", "user_id"), "1 hour", "0 seconds")
    val q = stream.writeStream.format("memory")
      .queryName("hll_regs").outputMode("complete").start()
    try {
      input.addData(events.take(3): _*)
      q.processAllAvailable()
      input.addData(events.drop(3): _*) // includes a LATE ts(5) arrival
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("hll_regs")
      .collect().map(_.toSeq).toSet

    val batch = events.toDF("ts", "event_type", "user_id")
      .select(org.apache.spark.sql.functions.window(col("ts"), "1 hour").as("win"),
        col("event_type"), graft.queries.Qdsl.hash60(col("user_id")).as("h"))
      .select(col("win"), col("event_type"), (col("h") % 256).as("j"),
        expr("h DIV 256").as("w"))
      .select(col("win"), col("event_type"), col("j"),
        when(col("w") === 0, 53)
          .otherwise(lit(53) - length(conv(col("w"), 10, 2))).as("rho"))
      .groupBy(col("win"), col("event_type"), col("j"))
      .agg(max(col("rho")).as("m"))
      .select(col("win.start"), col("event_type"), col("j"), col("m"))
      .collect().map(_.toSeq).toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.Sessions

/** Stream-static enrichment: a micro-batched stream joined against a
  * batch dimension table must produce exactly the rows the equivalent
  * batch join produces, across multiple batches, with unmatched stream
  * rows dropped (inner-join semantics).
  */
class StreamingEnrichSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("stream-static join equals the batch join across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("key"), col("c_mktsegment").as("segment"))

    val input = MemoryStream[(Long, Timestamp, Double)]
    val enriched = Sessions.enrichStream(
      input.toDF().toDF("key", "ts", "v"), dim, Seq("key"))
    val q = enriched.writeStream.format("memory")
      .queryName("enrich_test").outputMode("append").start()
    try {
      // batch 1: two enrichable keys + one key absent from the dimension
      input.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (-5L, ts(2), 3.0))
      q.processAllAvailable()
      // batch 2: a repeat key — stream-static joins keep no state, so it
      // must enrich again, independently
      input.addData((1L, ts(3), 4.0))
      q.processAllAvailable()

      val got = spark.table("enrich_test")
        .select(col("key"), col("v"), col("segment"))
      val want = Seq((1L, 1.0), (2L, 2.0), (-5L, 3.0), (1L, 4.0))
        .toDF("key", "v").join(dim, Seq("key"))
        .select(col("key"), col("v"), col("segment"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "streamed enrichment diverged from the batch join")
      // the unmatched key is dropped, matched rows carry the dim column
      assert(got.filter(col("key") === -5L).count() == 0)
      assert(got.filter(col("segment").isNull).count() == 0)
    } finally q.stop()
  }
}

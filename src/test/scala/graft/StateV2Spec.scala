package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StateV2
import graft.streaming.StateV2.QuotaEvent

/** transformWithState (Spark 4 typed-state API): per-key ValueState must
  * accumulate across micro-batches and emit exactly one row per crossed
  * quota multiple. Runs on the RocksDB state store transformWithState
  * requires.
  */
class StateV2Spec extends SparkSpec {

  test("quota processor emits one row per crossed multiple across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[QuotaEvent]
    val q = StateV2.quotaStream(input.toDS(), step = 5)
      .writeStream.format("memory").queryName("quota_test")
      .outputMode("append").start()
    try {
      // batch 1: user 1 × 4 events (below quota), user 2 × 11 (crosses 5 and 10)
      input.addData((1 to 4).map(_ => QuotaEvent(1L, 1.0)) ++
        (1 to 11).map(_ => QuotaEvent(2L, 1.0)): _*)
      q.processAllAvailable()
      // batch 2: user 1 × 3 more -> total 7, crosses 5 exactly once
      input.addData((1 to 3).map(_ => QuotaEvent(1L, 1.0)): _*)
      q.processAllAvailable()

      val got = spark.table("quota_test")
        .select(col("user_id"), col("threshold"), col("total")).as[(Long, Long, Long)]
        .collect().toSet
      val want = Set(
        (2L, 5L, 11L), (2L, 10L, 11L), // both multiples in one batch
        (1L, 5L, 7L))                  // state carried 4 across the batch gap
      assert(got == want, s"expected $want, got $got")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

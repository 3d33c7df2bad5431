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

  test("TTL actually evicts idle state between batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // TimeMode.ProcessingTime makes the engine schedule continuous
    // timer-sweep micro-batches (even under AvailableNow the stateful
    // operator keeps requesting another batch), so a long-lived query
    // never quiesces for processAllAvailable — drive each batch as its
    // own single-batch (Trigger.Once) run over a shared checkpoint
    // instead: state and value expirations live in RocksDB across
    // restarts, and an expired value is filtered at get() time no
    // matter which run wrote it.
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ttl_ckpt").toString
    val input = MemoryStream[QuotaEvent]
    // memory sink cannot RECOVER from a checkpoint, so crossings are
    // collected via foreachBatch (which can)
    val crossings =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]
    def runBatch(): Unit = {
      val q = StateV2.quotaStreamTtl(input.toDS(), step = 5, ttlMillis = 1000)
        .writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[StateV2.QuotaCrossing], _: Long) =>
            df.collect().foreach(c =>
              crossings.add((c.user_id, c.threshold, c.total)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      assert(q.awaitTermination(120000), "single-batch run did not finish")
    }
    try {
      // run 1: 4 events — below the quota, no crossing, state = 4
      input.addData((1 to 4).map(_ => QuotaEvent(1L, 1.0)): _*)
      runBatch()
      // idle past the 1 s TTL: the counter must be evicted
      Thread.sleep(3000)
      // run 2: 4 more. With state EVICTED the count restarts at 4 (no
      // crossing). If TTL were inert, the carried 4 would make 8 and
      // wrongly emit the threshold-5 crossing here with total 8.
      input.addData((1 to 4).map(_ => QuotaEvent(1L, 1.0)): _*)
      runBatch()
      // run 3 immediately (inside the TTL): +2 → 6, crossing at 5 —
      // proving post-eviction state accumulates again
      input.addData((1 to 2).map(_ => QuotaEvent(1L, 1.0)): _*)
      runBatch()

      val got = {
        val it = crossings.iterator()
        val b = Set.newBuilder[(Long, Long, Long)]
        while (it.hasNext) b += it.next()
        b.result()
      }
      // Run 3 must restart a whole query (checkpoint + RocksDB recovery)
      // inside run 2's 1 s TTL to observe the carried count; on a loaded
      // host that restart alone can exceed the TTL, in which case run
      // 2's state is already evicted at run 3's batch timestamp and no
      // crossing fires. BOTH outcomes prove eviction works — the test
      // must not flake on host speed — so run 3 asserts re-accumulation
      // only when the timing held. What can NEVER appear is (1,5,8),
      // the inert-TTL signature (run 2 seeing run 1's carried 4).
      assert(got == Set((1L, 5L, 6L)) || got.isEmpty,
        "expected eviction then fresh accumulation (Set((1,5,6))), or an " +
          s"empty set if run 3 itself outlived the TTL — got $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

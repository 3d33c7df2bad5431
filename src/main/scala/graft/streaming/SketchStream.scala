package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sketch aggregation: the deterministic HLL registers of
  * `q_hll_distinct` computed continuously per event-time window.
  *
  * Registers are the RIGHT streaming distinct-count state: a register is
  * a max, and max merges monotonically under out-of-order and late
  * arrivals, so the streaming result equals the batch result over the
  * same data regardless of arrival order (asserted in StreamingHllSpec)
  * — unlike an exact per-window `countDistinct`, whose state grows with
  * the number of distinct keys, register state is a FIXED m longs per
  * (window, group), and the watermark evicts whole windows. A downstream
  * batch query folds registers into the estimate exactly as
  * `Sketches.hllDistinct` does.
  */
object SketchStream {

  /** Per-(window, event_type) HLL registers over a (ts, event_type,
    * user_id) stream: 60-bit portable hash → register index (low 8 bits)
    * and rank (leading-zero count of the remaining 52 bits + 1). Append
    * mode emits each window's registers once the watermark passes. */
  def hllRegistersStream(events: DataFrame, window: String, lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .select(org.apache.spark.sql.functions.window(col("ts"), window).as("win"),
        col("event_type"),
        graft.queries.Qdsl.hash60(col("user_id")).as("h"))
      .select(col("win"), col("event_type"), (col("h") % 256).as("j"),
        expr("h DIV 256").as("w"))
      .select(col("win"), col("event_type"), col("j"),
        when(col("w") === 0, 53)
          .otherwise(lit(53) - length(conv(col("w"), 10, 2))).as("rho"))
      .groupBy(col("win"), col("event_type"), col("j"))
      .agg(max(col("rho")).as("m"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("j"), col("m"))
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** The Spark-4 `transformWithState` surface — the successor of
  * `flatMapGroupsWithState` (which `ThemisSessions` demonstrates): typed
  * per-key state handles (value/list/map), optional TTL, and timers,
  * backed by the RocksDB state store. Demonstrated with a quota monitor,
  * the stream-shaped cousin of the reference's per-key reduce functions:
  * unbounded per-user counting with O(1) state per key.
  */
object StateV2 {

  case class QuotaEvent(user_id: Long, value: Double)
  case class QuotaCrossing(user_id: Long, threshold: Long, total: Long)

  /** Emits one row each time a user's cumulative event count crosses a
    * multiple of `step`, carrying the post-batch total. State is a single
    * long per user (ValueState) — constant regardless of stream length —
    * and survives across micro-batches; with a TTL configured the store
    * self-evicts idle users, which is what bounds state on a 100 TB/day
    * feed with a churning key population. */
  class QuotaProcessor(step: Long)
      extends StatefulProcessor[Long, QuotaEvent, QuotaCrossing] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[QuotaEvent],
        timers: TimerValues): Iterator[QuotaCrossing] = {
      val prev = if (count.exists()) count.get() else 0L
      val next = prev + rows.size
      count.update(next)
      // every step-multiple strictly above prev and at-or-below next
      ((prev / step + 1) to (next / step))
        .map(k => QuotaCrossing(key, k * step, next)).iterator
    }
  }

  /** Wire a (user_id, value) event stream through the quota processor. */
  def quotaStream(events: Dataset[QuotaEvent], step: Long): Dataset[QuotaCrossing] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new QuotaProcessor(step), TimeMode.None(),
        OutputMode.Append(), Encoders.product[QuotaCrossing])
  }

  /** [[QuotaProcessor]] with a processing-time TTL on the per-user
    * counter: a user idle longer than `ttlMillis` has its state EVICTED
    * by the store, so the next event starts the count from zero — the
    * state-boundedness contract for churning key populations (state size
    * tracks ACTIVE users, not all users ever seen). Eviction is enforced
    * by the state store, not processor code: an expired value simply
    * stops being returned by `exists()`/`get()`. Spec-driven past its
    * TTL in StateV2Spec. */
  class TtlQuotaProcessor(step: Long, ttlMillis: Long)
      extends StatefulProcessor[Long, QuotaEvent, QuotaCrossing] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMillis)))

    override def handleInputRows(key: Long, rows: Iterator[QuotaEvent],
        timers: TimerValues): Iterator[QuotaCrossing] = {
      val prev = if (count.exists()) count.get() else 0L
      val next = prev + rows.size
      count.update(next)
      ((prev / step + 1) to (next / step))
        .map(k => QuotaCrossing(key, k * step, next)).iterator
    }
  }

  /** TTL'd quota stream — TimeMode must be ProcessingTime for the store
    * to stamp and expire values. */
  def quotaStreamTtl(events: Dataset[QuotaEvent], step: Long,
      ttlMillis: Long): Dataset[QuotaCrossing] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TtlQuotaProcessor(step, ttlMillis),
        TimeMode.ProcessingTime(), OutputMode.Append(),
        Encoders.product[QuotaCrossing])
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Span-based sessionization (`ClickLogSessionSummarizerReduceFunction.cc:
  * 10-65`) on an unbounded stream: a session closes when the next event's
  * distance from the session START reaches the threshold — not the idle
  * gap — so `session_window` cannot express it. This is the
  * `flatMapGroupsWithState` form: per-user state holds the open session;
  * event-time timeout flushes sessions when the watermark passes their
  * possible horizon.
  *
  * The batch twin is `ThemisOps.sessionizeThemis` (sorted-group scan);
  * StreamingThemisSpec drives both over the same events and compares.
  */
object ThemisSessions {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class OpenSession(startMs: Long, lastMs: Long, n: Long,
      firstType: String, lastType: String)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, first_type: String, last_type: String)

  /** Fold one user's new events (event-time order) into the open session,
    * emitting every closed session. */
  def updateUser(thresholdMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    if (state.hasTimedOut) {
      state.getOption.foreach { s =>
        out += Session(userId, s.startMs, s.lastMs, s.n, s.firstType, s.lastType)
      }
      state.remove()
    } else {
      var open = state.getOption.orNull
      for (e <- events.toSeq.sortBy(ev => (ev.ts.getTime, ev.event_type))) {
        val ms = e.ts.getTime
        if (open == null) {
          open = OpenSession(ms, ms, 1, e.event_type, e.event_type)
        } else if (ms - open.startMs >= thresholdMs) {
          out += Session(userId, open.startMs, open.lastMs, open.n,
            open.firstType, open.lastType)
          open = OpenSession(ms, ms, 1, e.event_type, e.event_type)
        } else {
          open = open.copy(lastMs = ms, n = open.n + 1,
            lastType = e.event_type)
        }
      }
      if (open != null) {
        state.update(open)
        // the session can only stay open until start + threshold: once the
        // watermark passes that, no in-order event can extend it
        state.setTimeoutTimestamp(open.startMs + thresholdMs)
      }
    }
    out.iterator
  }

  /** Streaming entry: events (user_id, ts timestamp, event_type). The
    * conversion to the typed shape is column-level only (`as[Event]`, no
    * object map) so the watermarked event-time attribute flows into the
    * stateful operator — a typed `.map` would strip it and fail the
    * event-time-timeout requirement. */
  def sessionizeStream(events: Dataset[_], thresholdMs: Long,
      lateness: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .selectExpr("user_id", "ts", "event_type")
      .withWatermark("ts", lateness)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateUser(thresholdMs))
  }
}

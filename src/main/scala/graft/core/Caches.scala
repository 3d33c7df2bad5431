package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Registry for persisted frames that must OUTLIVE their constructor.
  *
  * Query constructors return lazy plans; several persist a shared subplan
  * (a tokenize+agg projection, an LSH signature table) that the CALLER's
  * action materializes, so the constructor cannot unpersist it — only the
  * harness that ran the action knows when the plan is done. Iterative
  * operators that run their own actions keep using local try/finally
  * unpersist; everything else registers here and the harness drains the
  * registry after each query's action ([[graft.Verify]] per query,
  * [[graft.Bench]] after each query's timed passes). Library users
  * embedding the facade in a long-lived session call [[release]] the same
  * way — without it, repeated invocations accumulate cache-manager
  * entries until the context cleaner catches up.
  *
  * `unpersist(blocking = false)` keeps release off the critical path; a
  * plan re-persisted before its async drop completes simply re-marks the
  * same cache entry (Spark dedupes by canonicalized plan).
  */
object Caches {
  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** `df.persist()`, registered for a later [[release]] sweep. */
  def tracked(df: DataFrame): DataFrame = {
    val p = df.persist()
    live.add(p)
    p
  }

  /** Chain form of [[tracked]]: `df.trackedPersist()` in place of
    * `df.persist()` where the cache must outlive the constructor. */
  implicit class TrackedOps(private val df: DataFrame) extends AnyVal {
    def trackedPersist(): DataFrame = tracked(df)
  }

  /** Unpersist every tracked frame registered since the last drain. */
  def release(): Unit = {
    var d = live.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: Throwable => () } // a stopped session has nothing to drop
      d = live.poll()
    }
  }
}

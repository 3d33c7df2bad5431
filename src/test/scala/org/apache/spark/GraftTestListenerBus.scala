package org.apache.spark

/** Test-only bridge to the `private[spark]` listener bus: deterministic
  * event-drain instead of fixed sleeps (a loaded host can outlast any
  * constant; waitUntilEmpty blocks exactly until delivery). */
object GraftTestListenerBus {
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}

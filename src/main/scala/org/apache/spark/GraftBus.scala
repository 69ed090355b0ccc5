package org.apache.spark

/** Access to the private[spark] listener bus: flush it so SparkListener-
  * based job counters read exact, not racy, values. Used by [[graft.Bench]]
  * to emit per-query job counts (job count is load-invariant, so it
  * separates host noise from real plan regressions in round-over-round
  * bench comparisons) and by test specs via the GraftTestBus alias. */
object GraftBus {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

package org.apache.spark

/** Test-only access to the private[spark] listener bus: flush it so
  * SparkListener-based job counters are exact, not racy. */
object GraftTestBus {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

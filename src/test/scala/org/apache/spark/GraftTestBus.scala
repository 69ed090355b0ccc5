package org.apache.spark

/** Test alias of [[GraftBus]]: flush the listener bus so SparkListener-
  * based job counters are exact, not racy. */
object GraftTestBus {
  def flush(sc: SparkContext): Unit = GraftBus.flush(sc)
}

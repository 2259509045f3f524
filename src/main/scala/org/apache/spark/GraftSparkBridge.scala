package org.apache.spark

/** Core-side bridge (listener bus drain is private[spark]); companion to
  * org.apache.spark.sql.GraftColumnBridge.
  */
object GraftSparkBridge {
  /** Block until queued listener events (e.g. task-end metrics) have been
    * delivered, or the timeout elapses.
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}

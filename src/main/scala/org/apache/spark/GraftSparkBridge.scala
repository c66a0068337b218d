package org.apache.spark

/** Listener-bus bridge: stage-metric listeners receive events
  * asynchronously, so a benchmark that snapshots accumulated shuffle
  * bytes after a blocking action must first drain the bus — the accessor
  * is `private[spark]`, reached through a same-package bridge (the same
  * pattern as [[org.apache.spark.sql.GraftBridge]]).
  */
object GraftSparkBridge {
  def drainListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

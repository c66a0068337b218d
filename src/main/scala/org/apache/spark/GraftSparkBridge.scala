package org.apache.spark

/** Listener-bus bridge: stage-metric listeners receive events
  * asynchronously, so a benchmark that snapshots accumulated shuffle
  * bytes after a blocking action must first drain the bus — the accessor
  * is `private[spark]`, reached through a same-package bridge (the same
  * pattern as [[org.apache.spark.sql.GraftBridge]]).
  */
object GraftSparkBridge {
  def drainListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** The session's Hadoop configuration in an executor-shippable box
    * (`SerializableConfiguration` is `private[spark]`, so callers get an
    * opaque public wrapper): tasks that open files through the Hadoop FS
    * layer must see the same `spark.hadoop.*` settings (S3 credentials,
    * endpoints, kerberos) the driver resolved — a bare
    * `new Configuration()` on the executor reads only classpath XML and
    * silently drops them.
    */
  final class HadoopConfBox private[spark] (
      private val inner: util.SerializableConfiguration) extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = inner.value
  }

  def hadoopConfBox(sc: SparkContext): HadoopConfBox =
    new HadoopConfBox(new util.SerializableConfiguration(sc.hadoopConfiguration))
}

package org.apache.spark.sql

import org.apache.spark.{Partition, PartitionIdPassthrough, ShuffleDependency, SparkEnv, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.serializer.Serializer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.util.MutablePair

/** Row-level shuffle with a caller-chosen wire serializer — the pattern
  * `ShuffleExchangeExec` uses internally (rows ride the shuffle as
  * `(partitionId, row)` pairs through a passthrough partitioner, so no
  * per-record key objects exist), exposed for graft's packed count
  * exchange. Same-package bridge because `PartitionIdPassthrough`, the
  * shuffle reader API and temp read-metrics are `private[spark]`.
  */
object GraftShuffleBridge {

  /** Shuffle `child`'s rows into `numPartitions` buckets chosen by
    * `pidOf` (must return a value in [0, numPartitions)), serialized by
    * `ser`. The returned iterator's rows may be REUSED by the serializer
    * — consumers must copy what they keep (the standard exchange-output
    * contract).
    */
  def rowShuffle(
      child: RDD[InternalRow],
      numPartitions: Int,
      ser: Serializer,
      pidOf: InternalRow => Int): RDD[InternalRow] = {
    val withPid: RDD[Product2[Int, InternalRow]] = child.mapPartitions({ it =>
      val pair = new MutablePair[Int, InternalRow]()
      it.map(r => pair.update(pidOf(r), r))
    }, preservesPartitioning = true)
    val dep = new ShuffleDependency[Int, InternalRow, InternalRow](
      withPid, new PartitionIdPassthrough(numPartitions), ser)
    new PackedShuffledRDD(dep, numPartitions)
  }

  private final class PackedShuffledRDD(
      dep: ShuffleDependency[Int, InternalRow, InternalRow],
      numPartitions: Int,
  ) extends RDD[InternalRow](dep.rdd.context, Seq(dep)) {

    override protected def getPartitions: Array[Partition] =
      Array.tabulate(numPartitions) { i =>
        new Partition { override def index: Int = i }
      }

    override def compute(split: Partition,
        context: TaskContext): Iterator[InternalRow] = {
      val metrics = context.taskMetrics().createTempShuffleReadMetrics()
      SparkEnv.get.shuffleManager
        .getReader(dep.shuffleHandle, split.index, split.index + 1,
          context, metrics)
        .read()
        .map(_._2.asInstanceOf[InternalRow])
    }
  }
}

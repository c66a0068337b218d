package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.GraftSparkBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.binning._

/** Dev-only A/B of the packed CountByKey exchange vs the classic
  * UnsafeRow exchange, at the reference binning_4d shape (default 1e8
  * synthetic rows, 100⁴ cells, kernel plan). Interleaved reps in one JVM
  * (bench-weather discipline), shuffle-write bytes per run from the
  * stage-metrics listener.
  */
object PackProbe {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val n = sys.env.getOrElse("SPARK_GRAFT_REFBENCH_ROWS", "100000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REFBENCH_REPS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val meter = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        meter.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val nSplits = cpus.toInt * 4
    def events: DataFrame = spark.range(0L, n, 1L, nSplits).select(
      (rand(42) * 2048.0).as("X"), (rand(43) * 2048.0).as("Y"),
      (rand(44) * 60000.0 + 60000.0).as("t"),
      (rand(45) * 18000.0 + 2000.0).as("ADC"))
    val axes = Seq(
      UniformAxis("X", 100, 0.0, 2048.0), UniformAxis("Y", 100, 0.0, 2048.0),
      UniformAxis("t", 100, 60000.0, 120000.0),
      UniformAxis("ADC", 100, 2000.0, 20000.0))

    def run(packed: Boolean): (Double, Double) = {
      spark.conf.set("spark.graft.countByKey.packedExchange", packed.toString)
      GraftSparkBridge.drainListeners(spark.sparkContext)
      val s0 = meter.get()
      val t0 = System.nanoTime()
      exec(Binning.histogram(events, axes, plan = HistogramPlan.Kernel))
      val sec = (System.nanoTime() - t0) / 1e9
      GraftSparkBridge.drainListeners(spark.sparkContext)
      (sec, (meter.get() - s0) / 1e6)
    }
    run(packed = true); run(packed = false) // warm both codegen paths
    val arms = collection.mutable.Map("packed" -> List.empty[(Double, Double)],
      "classic" -> List.empty[(Double, Double)])
    (1 to reps).foreach { _ =>
      arms("packed") :+= run(packed = true)
      arms("classic") :+= run(packed = false)
    }
    for ((nm, rs) <- arms.toSeq.sortBy(_._1)) {
      println(f"[packab] $nm%-8s rows=$n min=${rs.map(_._1).min}%.3f s  " +
        rs.map(r => f"${r._1}%.2f").mkString(" ") +
        f"  shuffleMB=${rs.map(_._2).min}%.1f")
    }
    spark.stop()
  }
}

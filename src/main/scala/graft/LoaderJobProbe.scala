package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev probe: Spark job/stage counts for ONE materialization of each
  * single-file loader leg, lazy plan vs the eager LocalRelation path —
  * the evidence behind the round-13 loader-floor work (VERDICT r12
  * "What's wrong #2": the lazy flash materialization re-ran 13 jobs per
  * compute; the eager path is 1). Timings here are box-weather-y; the
  * canary-bracketed RefBench rows are the committed numbers. Not part of
  * the driver contract; run manually:
  * {{{ sbt "runMain graft.LoaderJobProbe" }}}
  */
object LoaderJobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[20]")
      .config("spark.sql.shuffle.partitions", "20")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = stages.incrementAndGet()
    })
    def exec(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def measure(tag: String, df: DataFrame): Unit = {
      exec(df) // warm
      org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext)
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      exec(df)
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext)
      println(f"[jobprobe] $tag%-14s jobs=${jobs.get}%-3d stages=${stages.get}%-3d $sec%6.3f s")
    }
    val mpes = "/root/reference/tests/data/loader/mpes/Scan0030_2.h5"
    val flash = "/root/reference/tests/data/loader/flash/FLASH1_USER3_stream_2_run43878_file1_20230130T153807.1.h5"
    val sxp = "/root/reference/tests/data/loader/sxp/RAW-R0016-DA03-S00000.h5"
    val buf = java.nio.file.Files.createTempDirectory("jobprobe").toString
    for (eager <- Seq(false, true)) {
      spark.conf.set("spark.graft.loader.eagerSmall", eager.toString)
      val tag = if (eager) "eager" else "lazy"
      measure(s"mpes_$tag", loader.StreamFixture.MpesH5Loader.readDataframe(spark, Seq(mpes))._1)
      measure(s"flash_$tag", loader.InstrumentH5Loader.readDataframe(spark, Seq(flash),
        loader.InstrumentH5Loader.flashDefaultChannels, pulseChannel = "pulseId",
        tofChannel = "dldTimeSteps", ubidOffset = 5, bufferDir = Some(s"$buf/flash_$tag"))._1)
      measure(s"sxp_$tag", loader.InstrumentH5Loader.readDataframe(spark, Seq(sxp),
        loader.InstrumentH5Loader.sxpDefaultChannels, pulseChannel = "pulseId",
        tofChannel = "dldTimeSteps", ubidOffset = 0, bufferDir = Some(s"$buf/sxp_$tag"))._1)
    }
    spark.stop()
  }
}

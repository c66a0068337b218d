package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.binning.UniformAxis
import graft.streaming.StreamingBinning

/** Dev utility (the stream64 rehearsal, ScaleProbe's pattern applied to
  * the streaming surface — the one surface with parity tests but no ×N
  * table): drive the three live-monitoring shapes through ×1..×64
  * micro-batch volume and report, per factor:
  *
  *  - per-batch trigger seconds (min/median over the run's batches),
  *  - state-store rows and bytes at the END of the run (the Update-mode
  *    snapshot sink claims watermark-bounded state — this measures it),
  *  - driver heap high-water across batches.
  *
  * Each parquet file becomes one micro-batch (`maxFilesPerTrigger=1`);
  * event time advances one window per batch so the watermark closes old
  * windows as a live monitor's would. A healthy surface shows per-batch
  * seconds ~linear in batch rows and state rows FLAT across factors
  * (state = open windows × filled cells, independent of batch volume).
  *
  * Not part of the driver contract; run manually:
  * {{{ sbt "runMain graft.StreamProbe" }}}
  */
object StreamProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val batches = 8
    val baseRows = sys.env.getOrElse("SPARK_GRAFT_STREAM_BASE", "50000").toInt
    val factors = Seq(1, 4, 16, 64)

    def heapMb(): Long = {
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) >> 20
    }

    /** Write `batches` parquet files, one window of events each. */
    def writeInput(f: Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"stream_probe_x$f")
        .toString + "/in"
      val rowsPerBatch = baseRows * f
      (0 until batches).foreach { b =>
        spark.range(rowsPerBatch)
          .select(
            // event time: batch b covers minute b (windows advance, the
            // watermark closes earlier windows as batches arrive)
            to_timestamp(lit(s"2024-01-01 00:0$b:00")).as("ts"),
            (rand(42 + b) * 100.0).as("value"),
            (col("id") % 8).as("sector"))
          .coalesce(1)
          .write.mode("append").parquet(dir)
      }
      dir
    }

    final case class RunStats(
        batchSec: Seq[Double], stateRows: Long, stateBytes: Long, heapHi: Long)

    /** Run a bounded streaming query file-by-file and harvest progress. */
    def drive(
        q: org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row],
        heapProbe: () => Long,
    ): RunStats = {
      val query = q.trigger(Trigger.AvailableNow()).start()
      var hi = heapProbe()
      while (query.isActive) {
        query.awaitTermination(200)
        hi = math.max(hi, heapProbe())
      }
      val progs = query.recentProgress.toSeq
        .filter(_.numInputRows > 0)
      val secs = progs.map(_.durationMs.get("triggerExecution").toLong / 1e3)
      val state = progs.lastOption.flatMap(p =>
        Option(p.stateOperators).filter(_.nonEmpty).map(ops =>
          (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)))
        .getOrElse((0L, 0L))
      RunStats(secs, state._1, state._2, hi)
    }

    def report(surface: String, f: Int, s: RunStats): Unit = {
      val sorted = s.batchSec.sorted
      val med = if (sorted.isEmpty) 0.0 else sorted(sorted.length / 2)
      println(f"STREAM64 $surface%-14s x$f%-3d batches=${s.batchSec.length}%-3d " +
        f"batch_min=${if (sorted.isEmpty) 0.0 else sorted.head}%.3f " +
        f"batch_med=$med%.3f state_rows=${s.stateRows}%-8d " +
        f"state_mb=${s.stateBytes >> 20}%-5d heap_hi_mb=${s.heapHi}")
    }

    factors.foreach { f =>
      val dir = writeInput(f)
      val schema = spark.read.parquet(dir).schema
      def stream: DataFrame = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)

      // 1. windowed histogram -> Update-mode cube snapshot sink (the live
      // binning monitor; retainWindows default bounds the driver acc)
      val ax = UniformAxis("value", 100, 0.0, 100.0)
      locally {
        val binned = StreamingBinning.windowedHistogram(
          stream, Seq(ax), "ts", "1 minute", watermark = "30 seconds")
        var snapHeap = 0L
        val sink = StreamingBinning.cubeSnapshotSink(binned, Seq(ax),
          (_, _) => snapHeap = math.max(snapHeap, heapMb()))
          .option("checkpointLocation", s"$dir/../ckpt_cube")
        val s = drive(sink, () => math.max(snapHeap, heapMb()))
        report("cube_snapshot", f, s)
      }

      // 2. PSI drift monitor against a fixed cached baseline
      locally {
        val baseline = spark.range(baseRows.toLong)
          .select((rand(7) * 100.0).as("value")).cache()
        baseline.count()
        val sink = StreamingBinning.psiStream(stream, baseline, ax,
          (_, rep) => { rep.collect(); () })
          .option("checkpointLocation", s"$dir/../ckpt_psi")
        val s = drive(sink, heapMb _)
        report("psi_stream", f, s)
        baseline.unpersist()
      }

      // 3. score-on-stream: the stateless calibration/quality chain over
      // each batch (transform passthrough -> append counts to a noop-like
      // memory-free foreachBatch)
      locally {
        val chain = StreamingBinning.transform(stream, df =>
          df.withColumn("e",
            graft.calibrate.Energy.tof2ev(col("value") * 1000 + 60000,
              1.0e4, -100.0, 2.0, 0))
            .withColumn("sectors_ok", col("sector") < 8))
        val sink = chain.writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.format("noop").mode("overwrite").save()
          }
          .option("checkpointLocation", s"$dir/../ckpt_score")
        val s = drive(sink, heapMb _)
        report("score_stream", f, s)
      }

      try {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(dir).getParentFile).deleteRecursively()
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.binning._

/** Dev-only stage decomposition of the bench workloads: isolates fixed
  * job overhead vs projection vs aggregation vs densification cost so
  * perf work targets the real bottleneck (NOTES.md round-3 ledger).
  */
object BenchProf {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(name: String)(f: => Unit): Unit = {
    f // warm
    val ts = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"PROF $name%-28s min=${ts.min}%7.3f s  med=${ts.sorted.apply(2)}%7.3f s")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // "dedup_floor": back-to-back reps of Bench's dedup_exact shape with
    // per-rep GC deltas — r18's Bench close twice saw a fluke-fast rep
    // whose floor never reproduced (agreed=1 → named unusable); this
    // mode separates "bimodal code" (GC / AQE variance would show here
    // on a quiet box) from "sub-bracket weather" (it would not).
    if (args.contains("dedup_floor")) {
      val documents = spark.read.parquet(s"$sfDir/documents.parquet")
        .repartition(cpus.toInt).cache()
      documents.count()
      def gcStats(): (Long, Long) = {
        import scala.jdk.CollectionConverters._
        val beans = java.lang.management.ManagementFactory
          .getGarbageCollectorMXBeans.asScala
        (beans.map(_.getCollectionCount).sum,
          beans.map(_.getCollectionTime).sum)
      }
      exec(pipeline.Dedup.exactDuplicates(documents, "text", "doc_id")) // warm
      (1 to 20).foreach { i =>
        val (c0, g0) = gcStats()
        val t0 = System.nanoTime()
        exec(pipeline.Dedup.exactDuplicates(documents, "text", "doc_id"))
        val sec = (System.nanoTime() - t0) / 1e9
        val (c1, g1) = gcStats()
        println(f"DEDUP_FLOOR rep=$i%-3d $sec%7.3f s  " +
          f"gc_events=${c1 - c0}%-3d gc_ms=${g1 - g0}%-5d")
      }
      spark.stop()
      return
    }

    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .repartition(cpus.toInt).cache()
    lineitem.count()

    val ax1 = UniformAxis("l_extendedprice", 1000, 900.0, 105000.0)
    val ax4 = Seq(
      UniformAxis("l_quantity", 100, 1.0, 50.0),
      UniformAxis("l_extendedprice", 100, 900.0, 105000.0),
      UniformAxis("l_discount", 100, 0.0, 0.11),
      UniformAxis("l_tax", 100, 0.0, 0.09))

    time("cached count (floor)") { lineitem.count() }
    time("noop write passthrough") { exec(lineitem.select("l_quantity")) }
    time("1d flat project+filter") {
      exec(lineitem.select(Binning.flatBinIndex(Seq(ax1), Seq(1L)).as("_flat"))
        .filter(col("_flat") >= 0))
    }
    time("1d sparse hist (noop)") { exec(Binning.histogram(lineitem, Seq(ax1))) }
    time("1d dense cube (collect)") { Binning.histogramCube(lineitem, Seq(ax1)) }
    val strides4 = Seq(100L * 100 * 100, 100L * 100, 100L, 1L)
    time("4d flat project+filter") {
      exec(lineitem.select(Binning.flatBinIndex(ax4, strides4).as("_flat"))
        .filter(col("_flat") >= 0))
    }
    time("4d flat groupBy (no decode)") {
      exec(lineitem.select(Binning.flatBinIndex(ax4, strides4).as("_flat"))
        .filter(col("_flat") >= 0).groupBy("_flat").agg(count(lit(1)).as("cnt")))
    }
    time("4d sparse hist (noop)") { exec(Binning.histogram(lineitem, ax4)) }

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("count, AQE off") { lineitem.count() }
    time("4d flat groupBy, AQE off") {
      exec(lineitem.select(Binning.flatBinIndex(ax4, strides4).as("_flat"))
        .filter(col("_flat") >= 0).groupBy("_flat").agg(count(lit(1)).as("cnt")))
    }
    time("1d dense cube, AQE off") { Binning.histogramCube(lineitem, Seq(ax1)) }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    time("4d groupBy, AQE off, 8 part") {
      exec(lineitem.select(Binning.flatBinIndex(ax4, strides4).as("_flat"))
        .filter(col("_flat") >= 0).groupBy("_flat").agg(count(lit(1)).as("cnt")))
    }
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    time("4d groupBy, AQE off, 64 part") {
      exec(lineitem.select(Binning.flatBinIndex(ax4, strides4).as("_flat"))
        .filter(col("_flat") >= 0).groupBy("_flat").agg(count(lit(1)).as("cnt")))
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    time("4d groupBy, AQE szFirst") {
      exec(lineitem.select(Binning.flatBinIndex(ax4, strides4).as("_flat"))
        .filter(col("_flat") >= 0).groupBy("_flat").agg(count(lit(1)).as("cnt")))
    }
    time("1d sparse, AQE szFirst") { exec(Binning.histogram(lineitem, Seq(ax1))) }
    time("1d dense cube, AQE szFirst") { Binning.histogramCube(lineitem, Seq(ax1)) }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage decomposition of the dedup_minhash bench workload (the
  * ×10 leg's dominant cost — 2.7 s of the 6.5 s total in BENCH_r17): times
  * each pipeline slice in isolation so the optimization targets the real
  * bottleneck (guide §1: measure first). Mirrors Bench's ×10 corpus
  * construction exactly (Caesar-shifted copies, doc_id-repartitioned
  * uncached scan).
  */
object MinhashProbe {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(name: String)(f: => Unit): Unit = {
    f // warm
    val ts = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"PROF $name%-34s min=${ts.min}%7.3f s  med=${ts.sorted.apply(2)}%7.3f s")
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
    val nPart = cpus.toInt

    // ×10 corpus exactly as Bench builds it
    val dir = java.nio.file.Files.createTempDirectory("graft_minhash_probe").toString
    val copies = explode(sequence(lit(0), lit(9))).as("copy")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), copies)
      .select(
        (col("doc_id") + col("copy") * lit(10000000L)).as("doc_id"),
        element_at(
          array((0 until 10).map(k =>
            translate(col("text"), alpha, alpha.drop(k) + alpha.take(k))): _*),
          col("copy") + 1).as("text"))
      .repartition(nPart, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/documents")
    val docXScan = spark.read.parquet(s"$dir/documents")
      .repartition(nPart, col("doc_id"))

    import pipeline.Dedup
    import org.apache.spark.sql.Column

    // the pre-fusion declarative signature pipeline, verbatim, as the
    // side-by-side "before" (bit-identical output — MinHashTextExprSpec)
    def declSig(text: Column): Column =
      transform(array(Dedup.baseShingleHashes(text, 5)), base =>
        Dedup.minhashFromBase(base, 32, 42L)).getItem(0)
    def declSigs(df: DataFrame): DataFrame =
      df.select(col("doc_id").as("id"), declSig(col("text")).as("sig"))

    if (args.contains("plans")) {
      val outDir = java.nio.file.Paths.get("plans/r18")
      java.nio.file.Files.createDirectories(outDir)
      def dump(name: String, df: DataFrame): Unit =
        java.nio.file.Files.write(outDir.resolve(name),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
            .getBytes("UTF-8"))
      dump("dedup_minhash_before.txt",
        Dedup.minhashFromSigs(declSigs(docXScan).repartition(col("id")),
          32, 8, 0.5, inlineVerify = false))
      dump("dedup_minhash_after.txt",
        Dedup.minhashNearDuplicates(docXScan, "text", "doc_id", threshold = 0.5))
      println("PLANS dumped to plans/r18/")
    }

    if (args.contains("counts")) {
      val banded = Dedup.minhashBands(
        Dedup.minhashSignatures(docXScan, "text", "doc_id")
          .repartition(col("id")), 32, 8)
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.band_idx") === col("b.band_idx")
            && col("a.band_hash") === col("b.band_hash"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      println(s"COUNT banded=${banded.count()} preDistinct=${cand.count()} " +
        s"distinct=${cand.distinct().count()} " +
        s"pairs=${Dedup.minhashNearDuplicates(docXScan, "text", "doc_id",
          threshold = 0.5).count()}")
    }

    spark.sparkContext.setJobDescription("minhash: OLD declarative sigs")
    time("OLD declarative sigs (noop)") { exec(declSigs(docXScan)) }
    spark.sparkContext.setJobDescription("minhash: OLD full default plan")
    time("OLD full default plan") {
      exec(Dedup.minhashFromSigs(declSigs(docXScan).repartition(col("id")),
        32, 8, 0.5, inlineVerify = false))
    }

    spark.sparkContext.setJobDescription("minhash: full default plan")
    time("full minhashNearDuplicates") {
      exec(Dedup.minhashNearDuplicates(docXScan, "text", "doc_id", threshold = 0.5))
    }
    spark.sparkContext.setJobDescription("minhash: full auto plan")
    time("full minhashNearDuplicatesAuto") {
      exec(Dedup.minhashNearDuplicatesAuto(docXScan, "text", "doc_id", threshold = 0.5))
      spark.catalog.clearCache()
    }
    spark.sparkContext.setJobDescription("minhash: signatures only")
    time("signatures only (noop)") {
      exec(Dedup.minhashSignatures(docXScan, "text", "doc_id"))
    }
    spark.sparkContext.setJobDescription("minhash: sig+repart")
    time("sig + repartition(id) (noop)") {
      exec(Dedup.minhashSignatures(docXScan, "text", "doc_id")
        .repartition(col("id")))
    }
    spark.sparkContext.setJobDescription("minhash: sig+repart+bands")
    time("sig + repart + bands (noop)") {
      exec(Dedup.minhashBands(
        Dedup.minhashSignatures(docXScan, "text", "doc_id")
          .repartition(col("id")), 32, 8))
    }
    spark.sparkContext.setJobDescription("minhash: candidates distinct")
    time("... + self-join + distinct") {
      val banded = Dedup.minhashBands(
        Dedup.minhashSignatures(docXScan, "text", "doc_id")
          .repartition(col("id")), 32, 8)
      exec(banded.as("a")
        .join(banded.as("b"),
          col("a.band_idx") === col("b.band_idx")
            && col("a.band_hash") === col("b.band_hash"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct())
    }
    spark.sparkContext.setJobDescription("scan only")
    time("scan + repartition (noop)") { exec(docXScan) }
    spark.sparkContext.setJobDescription(null)

    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    } catch { case _: Throwable => () }
    spark.stop()
  }
}

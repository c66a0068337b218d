package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CensusProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32, col("doc_id"))
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val variants: Seq[(String, () => Unit)] = Seq(
      "census_f1.0" -> (() => { pipeline.Dedup.minhashPairMassCensus(docs, "text", "doc_id"); () }),
      "census_f0.1" -> (() => { pipeline.Dedup.minhashPairMassCensus(docs, "text", "doc_id", fraction = 0.1); () }),
      "dedup_default" -> (() => exec(pipeline.Dedup.minhashNearDuplicates(docs, "text", "doc_id", threshold = 0.5))),
      "dedup_auto" -> (() => exec(pipeline.Dedup.minhashNearDuplicatesAuto(docs, "text", "doc_id", threshold = 0.5))),
    )
    variants.foreach { case (_, r) => r() } // warm
    val times = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to 3; (n, r) <- variants) {
      val t0 = System.nanoTime(); r()
      times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (n, _) =>
      println(f"[census] $n%-14s min=${times(n).min}%.3f  " + times(n).map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}

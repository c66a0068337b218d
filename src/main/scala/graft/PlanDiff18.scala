package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: emits plans/r18 before/after `.explain("formatted")` for the
  * round-19 (driver r18) optimizations whose queries are not PLANS.md
  * sections — q_simhash_pairs (fused SimHashFromTokensExpr vs the
  * declarative tokenHashes/simhashFromHashes pipeline, reconstructed
  * verbatim from the preserved helpers) and the TextIndex postings write
  * (bucket-clustered vs task-fanned).
  */
object PlanDiff18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = java.nio.file.Paths.get("plans/r18")
    java.nio.file.Files.createDirectories(out)
    def dump(name: String, df: DataFrame): Unit =
      java.nio.file.Files.write(out.resolve(name),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import pipeline.{Dedup, TextOps}

    // ---- q_simhash_pairs ------------------------------------------------
    dump("q_simhash_pairs_after.txt",
      Dedup.simhashNearDuplicates(docs, "text", "doc_id", maxDistance = 16,
        portable = true).withColumn("distance", col("distance").cast("long")))
    // the pre-fusion body, verbatim (sig projection via the preserved
    // declarative helpers; banding/join identical)
    val bits = 62
    val blocks = 17
    val width = bits / blocks
    val sigsOld = docs
      .select(col("doc_id").as("id"),
        Dedup.tokenHashes(col("text"), portable = true).as("_th"))
      .select(col("id"), Dedup.simhashFromHashes(col("_th"), bits).as("sig"))
    val bandedOld = sigsOld.select(
      col("id"), col("sig"),
      posexplode(array((0 until blocks).map { blk =>
        shiftright(col("sig"), blk * width).bitwiseAND(lit((1L << width) - 1))
      }: _*)),
    ).withColumnsRenamed(Map("pos" -> "block_idx", "col" -> "block_val"))
    dump("q_simhash_pairs_before.txt",
      bandedOld.as("a")
        .join(bandedOld.as("b"),
          col("a.block_idx") === col("b.block_idx")
            && col("a.block_val") === col("b.block_val"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          Dedup.hamming(col("a.sig"), col("b.sig")).as("distance"))
        .filter(col("distance") <= 16)
        .distinct()
        .withColumn("distance", col("distance").cast("long")))

    // ---- text-index postings write (file-layout change) -----------------
    val tf = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val postings = tf.withColumn("term_bucket", pmod(hash(col("term")), lit(64)))
    dump("text_index_postings_write_before.txt", postings)
    dump("text_index_postings_write_after.txt",
      postings.repartition(col("term_bucket")))
    println("PLANDIFF18 done")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: emits plans/r19 before/after `.explain("formatted")` for the
  * round-19 optimizations — the q_fuzzy_pairs payload detach (after;
  * before is the committed r18 plan, copied with provenance noted in
  * OPTIMIZATION_r19.md), the qualityColumns token/stopword kernel
  * (before reconstructed verbatim from the pre-round struct-HOF
  * formulation), the binning_4d packed count exchange (before via the
  * `spark.graft.countByKey.packedExchange=false` fallback), and the
  * minhash hot-key-guarded distinct (both gate states on a degenerate
  * corpus).
  */
object PlanDiff19 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = java.nio.file.Paths.get("plans/r19")
    java.nio.file.Files.createDirectories(out)
    def dump(name: String, df: DataFrame): Unit =
      java.nio.file.Files.write(out.resolve(name),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import pipeline.{Dedup, TextOps}

    // ---- q_fuzzy_pairs (payload detach) ---------------------------------
    // after only: the "before" is exactly the plan the r18 close committed
    // (plans/r18/q_fuzzy_pairs_after.txt), copied to
    // plans/r19/q_fuzzy_pairs_before.txt
    dump("q_fuzzy_pairs_after.txt", SparkEntry.queries("q_fuzzy_pairs")(spark, dir))

    // ---- q_quality / text_quality (token+stopword kernel) ---------------
    dump("q_quality_after.txt", SparkEntry.queries("q_quality")(spark, dir))
    dump("text_quality_after.txt", TextOps.qualityColumns(docs, "text"))
    // the pre-round struct-HOF formulation, verbatim
    val t = col("text")
    val toks = split(trim(t), "\\s+")
    val sig = transform(array(toks), ts => struct(
      size(ts).as("n_tokens"),
      size(filter(ts, w => w.isin(TextOps.EnStopwords: _*))).as("n_stop"),
    )).getItem(0)
    dump("text_quality_before.txt", docs.withColumn("_q", sig)
      .withColumns(Map(
        "n_tokens" -> col("_q.n_tokens"),
        "n_chars_m" -> length(t),
        "avg_token_len" ->
          (length(regexp_replace(t, "\\s+", "")).cast("double") / col("_q.n_tokens")),
        "punct_ratio" -> (TextOps.punctCount(t).cast("double") / length(t)),
        "stopword_ratio" -> (col("_q.n_stop").cast("double") / col("_q.n_tokens")),
      ))
      .drop("_q"))

    // ---- binning_4d (packed narrow-wire count exchange) ------------------
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val axes4 = Seq(
      binning.UniformAxis("l_quantity", 100, 1.0, 50.0),
      binning.UniformAxis("l_extendedprice", 100, 900.0, 105000.0),
      binning.UniformAxis("l_discount", 100, 0.0, 0.11),
      binning.UniformAxis("l_tax", 100, 0.0, 0.09))
    spark.conf.set("spark.graft.countByKey.packedExchange", "false")
    dump("binning_4d_before.txt", binning.Binning.histogram(lineitem, axes4))
    spark.conf.set("spark.graft.countByKey.packedExchange", "true")
    dump("binning_4d_after.txt", binning.Binning.histogram(lineitem, axes4))

    // ---- minhash hot-key-guarded distinct --------------------------------
    // degenerate corpus: 8 byte-identical copies per doc → one hot band
    // bucket per base doc; pairMassPerDoc pinned huge so the ROUTE stays
    // the default (distinct-carrying) plan and only the guard varies
    val clique = docs.limit(200)
      .withColumn("copy", explode(sequence(lit(0), lit(7))))
      .select((col("doc_id") * 100 + col("copy")).as("doc_id"), col("text"))
    spark.conf.set("spark.graft.minhash.hotKeyRowCap", "10")
    dump("dedup_minhash_hotkey_guarded.txt",
      Dedup.minhashNearDuplicatesAuto(clique, "text", "doc_id",
        threshold = 0.5, pairMassPerDoc = 1e18, censusFloorBytes = 0L))
    spark.conf.unset("spark.graft.minhash.hotKeyRowCap")
    dump("dedup_minhash_hotkey_unguarded.txt",
      Dedup.minhashNearDuplicatesAuto(clique, "text", "doc_id",
        threshold = 0.5, pairMassPerDoc = 1e18, censusFloorBytes = 0L))
    println("PLANDIFF19 done")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition of the q_fuzzy_pairs fixture: counts the
  * candidate volumes at each tier of [[graft.pipeline.Fuzzy]]'s guarded
  * blocked join (the quadratic side), so per-candidate optimizations
  * target the measured mass, not a guess.
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", false)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // the q_fuzzy_pairs fixture corpus, verbatim
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), substring(col("text"), 1, 40).as("txt"))
    val corpus = docs.unionByName(docs.select(
      (col("doc_id") + 100000).as("doc_id"), col("source"),
      concat(col("txt"), lit("x")).as("txt")))

    println("SOURCES " + corpus.groupBy("source").count().collect().toSeq)

    // tier structure mirrored from Fuzzy.editSimilarityPairs (k=2)
    val bandWidth = 3
    val members = corpus.select(col("doc_id").as("id"), col("txt"),
      col("source").as("blk")).filter(col("txt").isNotNull)
    val reps = members.groupBy(col("blk"), col("txt"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("cnt"))
      .withColumn("base", (length(col("txt")).cast("long") / bandWidth).cast("long"))
    val probes = reps.select(col("id"), col("blk"), col("cnt"), col("base"),
      explode(array(col("base"), col("base") + 1)).as("band"))
    println("REPS " + reps.count() + "  PROBES " + probes.count())
    val groups = probes.groupBy(col("blk"), col("band"))
      .agg(count(lit(1)).as("n")).orderBy(desc("n"))
    groups.collect().take(8).foreach(r =>
      println(s"GROUP blk=${r.get(0)} band=${r.get(1)} n=${r.getLong(2)}"))
    val over = groups.filter(col("n") > 4096)
      .select(col("blk"), col("band"),
        ceil(col("n").cast("double") / 4096).cast("long").as("buckets"))
    println("OVERSIZED " + over.collect().toSeq)

    // per-tier cost of the candidate join, exactly the unguarded shape
    import graft.pipeline.{Fuzzy, SortedLongIntersectCount}
    def time(name: String)(f: => Long): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"FPROF $name%-30s min=${ts.map(_._1).min}%7.2f s rows=${ts.head._2}")
    }
    val qgrams = graft.pipeline.Fuzzy.qgramsOf(col("txt"))
    val ann = reps.withColumn("qg", qgrams)
      .withColumn("sb", lit(-1)).withColumn("sub", lit(0L))
      .select(col("id"), col("txt"), col("blk"), col("qg"), col("cnt"),
        col("base"), explode(array(col("base"), col("base") + 1)).as("band"),
        col("sb"), col("sub"))
    val joined = ann.as("a").join(ann.as("b"), Seq("blk", "band", "sb", "sub"))
      .filter(col("a.id") < col("b.id"))
    time("join + id<") { joined.count() }
    val banded = joined.filter(col("band") === greatest(col("a.base"), col("b.base")))
    time("+ band rule") { banded.count() }
    val inter = org.apache.spark.sql.GraftBridge.column(
      SortedLongIntersectCount(
        org.apache.spark.sql.GraftBridge.expression(col("a.qg")),
        org.apache.spark.sql.GraftBridge.expression(col("b.qg"))))
    val ukk = banded.filter(inter >=
      greatest(length(col("a.txt")), length(col("b.txt"))) - lit(2 + 2 * 3))
    time("+ ukkonen") { ukk.count() }
    val dp = ukk.withColumn("dist", levenshtein(col("a.txt"), col("b.txt"), 2))
      .filter(col("dist") >= 0 && col("dist") <= 2)
    time("+ levenshtein") { dp.count() }
    time("full operator") {
      Fuzzy.editSimilarityPairs(corpus, "doc_id", "txt", "source",
        maxEdit = 2).count()
    }

    // hypothesis splits: array payload carriage vs kernel eval vs the
    // annotated/explode machinery of the real operator
    time("+ carry qg, cheap filter") {
      banded.filter(size(col("a.qg")) + size(col("b.qg")) > 0).count()
    }
    time("+ inter as column sum") {
      banded.select(inter.as("i")).agg(sum(col("i"))).collect()(0).getLong(0)
    }
    val probes2 = reps.withColumn("qg", qgrams)
      .select(col("id"), col("txt"), col("blk"), col("qg"), col("cnt"),
        col("base"), explode(array(col("base"), col("base") + 1)).as("band"))
    val over2 = probes2.groupBy(col("blk"), col("band"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 4096)
      .select(col("blk"), col("band"),
        ceil(col("_n").cast("double") / 4096).cast("long").as("_buckets"))
    val ann2 = probes2.join(broadcast(over2), Seq("blk", "band"), "left")
      .withColumn("mhs",
        when(col("_buckets").isNull, array().cast("array<bigint>"))
          .otherwise(org.apache.spark.sql.GraftBridge.column(
            graft.pipeline.SubBandMinhashes(
              org.apache.spark.sql.GraftBridge.expression(col("qg")),
              org.apache.spark.sql.GraftBridge.expression(col("_buckets")), 6))))
      .withColumn("sb",
        explode(when(col("_buckets").isNull, array(lit(-1)))
          .otherwise(sequence(lit(0), lit(5)))))
      .withColumn("sub",
        when(col("sb") === -1, lit(0L))
          .otherwise(element_at(col("mhs"), col("sb") + 1)))
      .drop("_buckets")
    val joined2 = ann2.as("a").join(ann2.as("b"), Seq("blk", "band", "sb", "sub"))
      .filter(col("a.id") < col("b.id"))
      .filter(col("band") === greatest(col("a.base"), col("b.base")))
      .filter(col("sb") === -1 ||
        org.apache.spark.sql.GraftBridge.column(graft.pipeline.FirstEqualIndex(
          org.apache.spark.sql.GraftBridge.expression(col("a.mhs")),
          org.apache.spark.sql.GraftBridge.expression(col("b.mhs"))))
          === col("sb") + 1)
      .filter(inter >= greatest(length(col("a.txt")), length(col("b.txt"))) -
        lit(2 + 2 * 3))
      .withColumn("dist", levenshtein(col("a.txt"), col("b.txt"), 2))
      .filter(col("dist") >= 0 && col("dist") <= 2)
    time("annotated-shaped tier2 full") { joined2.count() }
    spark.stop()
  }
}

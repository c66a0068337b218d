package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "spark joins shuffle data across the cluster"),
    (1L, "a vector index prunes the search space"),
    (2L, "spark spark spark vector"),
    (3L, "unrelated prose about gardening and tea"),
    (4L, "join the spark cluster to index a vector"),
    (5L, "shuffle partitions bound join memory"),
  ).toDF("doc_id", "text")

  test("index search returns exactly the in-flight bm25 scores") {
    val dir = Files.createTempDirectory("tidx").toString
    TextIndex.build(corpus, "text", "doc_id", dir, nBuckets = 8)
    val got = TextIndex.search(spark, dir, Seq("spark", "vector"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = TextOps.bm25(corpus, "text", "doc_id", Seq("spark", "vector"))
      .select(col("doc_id"), round(col("bm25"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === want.toSeq)
  }

  test("search prunes postings and vocab scans to the query's term buckets") {
    val dir = Files.createTempDirectory("tidx").toString
    TextIndex.build(corpus, "text", "doc_id", dir, nBuckets = 8)
    val res = TextIndex.search(spark, dir, Seq("spark"), k = 3)
    val plan = res.queryExecution.executedPlan.toString
    // the bucket predicate must reach BOTH scans as a partition filter
    val hits = "PartitionFilters: \\[[^\\]]*term_bucket[^\\]]*\\]".r
      .findAllIn(plan).length
    assert(hits >= 2, s"expected term_bucket partition filters in:\n$plan")
    assert(res.count() > 0)
  }

  test("searchAll matches per-query single search") {
    val dir = Files.createTempDirectory("tidx").toString
    TextIndex.build(corpus, "text", "doc_id", dir, nBuckets = 8)
    val (n, avg, _) = TextIndex.loadStats(spark, dir)
    val queries = Seq(
      (10L, Seq("spark", "vector")),
      (11L, Seq("join")),
      (12L, Seq("gardening", "tea"))).toDF("q_id", "terms")
    val batch = TextIndex.searchAll(queries, "q_id", "terms",
      spark.read.parquet(s"$dir/postings"), n, avg, k = 4,
      vocab = Some(spark.read.parquet(s"$dir/vocab")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    for ((qid, terms) <- Seq(10L -> Seq("spark", "vector"),
        11L -> Seq("join"), 12L -> Seq("gardening", "tea"))) {
      val single = TextIndex.search(spark, dir, terms, k = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val got = batch(qid).sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3))
      assert(got.toSeq === single.toSeq, s"query $qid")
    }
  }

  test("duplicate terms in a query do not double-count") {
    val dir = Files.createTempDirectory("tidx").toString
    TextIndex.build(corpus, "text", "doc_id", dir, nBuckets = 8)
    val (n, avg, _) = TextIndex.loadStats(spark, dir)
    val postings = spark.read.parquet(s"$dir/postings")
    def run(ts: Seq[String]) =
      TextIndex.searchAll(Seq((0L, ts)).toDF("q_id", "terms"), "q_id", "terms",
        postings, n, avg, k = 10)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(run(Seq("spark", "spark")) === run(Seq("spark")))
  }
}

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

  test("merge equals a from-scratch rebuild: postings, vocab, stats, scores") {
    val dirInc = Files.createTempDirectory("tidx_inc").toString
    val dirAll = Files.createTempDirectory("tidx_all").toString
    val first = corpus.filter(col("doc_id") < 4)
    val rest = corpus.filter(col("doc_id") >= 4)
    TextIndex.build(first, "text", "doc_id", dirInc, nBuckets = 8)
    val n = TextIndex.merge(rest, "text", "doc_id", dirInc)
    TextIndex.build(corpus, "text", "doc_id", dirAll, nBuckets = 8)
    assert(n === 6L)
    assert(TextIndex.loadStats(spark, dirInc) ===
      TextIndex.loadStats(spark, dirAll))
    def sorted(dir: String, sub: String, cols: Seq[String]) =
      spark.read.parquet(s"$dir/$sub").select(cols.map(col): _*)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(sorted(dirInc, "vocab", Seq("term", "df")).toSeq ===
      sorted(dirAll, "vocab", Seq("term", "df")).toSeq)
    assert(sorted(dirInc, "postings", Seq("doc_id", "term", "tf", "doc_len")).toSeq ===
      sorted(dirAll, "postings", Seq("doc_id", "term", "tf", "doc_len")).toSeq)
    val a = TextIndex.search(spark, dirInc, Seq("spark", "vector"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = TextIndex.search(spark, dirAll, Seq("spark", "vector"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("merge of an EMPTY batch is a no-op (no NPE, index untouched)") {
    val dir = Files.createTempDirectory("tidx_empty").toString
    TextIndex.build(corpus, "text", "doc_id", dir, nBuckets = 8)
    val statsBefore = TextIndex.loadStats(spark, dir)
    val n = TextIndex.merge(corpus.filter(col("doc_id") < 0),
      "text", "doc_id", dir)
    assert(n === statsBefore._1)
    assert(TextIndex.loadStats(spark, dir) === statsBefore)
    // the vocab generation was never swapped
    assert(!new java.io.File(s"$dir/vocab_old").exists())
  }

  test("scoreColumn is map-only and matches search scores (0.0 for no hits)") {
    val dir = Files.createTempDirectory("tidx").toString
    TextIndex.build(corpus, "text", "doc_id", dir, nBuckets = 8)
    val (n, avg, _) = TextIndex.loadStats(spark, dir)
    val terms = Seq("spark", "vector")
    val dfs = TextIndex.termDfs(spark, dir, terms)
    assert(dfs.keySet === Set("spark", "vector"))
    val scoredDf = corpus.select(col("doc_id"),
      TextIndex.scoreColumn(col("text"), dfs, n, avg).as("bm25"))
    // no exchange anywhere: scoring a stream/ingest batch must not shuffle
    val plan = scoredDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a map-only plan:\n$plan")
    val got = scoredDf.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val want = TextIndex.search(spark, dir, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    want.foreach { case (id, s) => assert(got(id) === s, s"doc $id") }
    // docs with no query term score exactly 0.0
    assert(got(3L) === 0.0)
  }

  test("maxDfFraction prunes stopword-grade terms before candidates") {
    val dir = Files.createTempDirectory("tidx").toString
    TextIndex.build(corpus, "text", "doc_id", dir, nBuckets = 8)
    val (n, avg, _) = TextIndex.loadStats(spark, dir)
    val postings = spark.read.parquet(s"$dir/postings")
    def run(ts: Seq[String], frac: Option[Double]) =
      TextIndex.searchAll(Seq((0L, ts)).toDF("q_id", "terms"), "q_id",
        "terms", postings, n, avg, k = 10, maxDfFraction = frac)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    // frac = 1.0 admits every term: identical to the unpruned plan
    assert(run(Seq("spark", "gardening"), Some(1.0)) ===
      run(Seq("spark", "gardening"), None))
    // df(spark) = 3 > 0.4 × 6 — pruned; survivors are ranked exactly,
    // so the query degrades to its rare term
    assert(run(Seq("spark", "gardening"), Some(0.4)) ===
      run(Seq("gardening"), None))
    // a query of only stopword-grade terms yields no rows (not a crash)
    assert(run(Seq("spark"), Some(0.4)) === Seq.empty)
  }

  test("auto df-prune: default floor is a no-op on small corpora, the " +
      "rule prunes stopword-grade terms above it, both directions pinned") {
    val dir = Files.createTempDirectory("tidx").toString
    TextIndex.build(corpus, "text", "doc_id", dir, nBuckets = 8)
    val (n, avg, _) = TextIndex.loadStats(spark, dir)
    val postings = spark.read.parquet(s"$dir/postings")
    def run(ts: Seq[String], frac: Option[Double], auto: Boolean,
        minDf: Long = TextIndex.AutoPruneMinDf) =
      TextIndex.searchAll(Seq((0L, ts)).toDF("q_id", "terms"), "q_id",
        "terms", postings, n, avg, k = 10, maxDfFraction = frac,
        autoDfPrune = auto, autoPruneMinDf = minDf)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    // default call (auto, floor 10000): identical to the unpruned plan
    // on a corpus where every df sits under the floor
    assert(run(Seq("spark", "gardening"), None, auto = true) ===
      run(Seq("spark", "gardening"), None, auto = false))
    // floor lowered so the rule bites: cap = max(2, 0.1·6) = 2 —
    // df(spark) = 3 is dropped, the rare term survives and is ranked
    // exactly (≡ querying the rare term against the unpruned plan)
    assert(run(Seq("spark", "gardening"), None, auto = true, minDf = 2) ===
      run(Seq("gardening"), None, auto = false))
    // a pure-stopword query returns no rows under the active rule
    assert(run(Seq("spark"), None, auto = true, minDf = 2) === Seq.empty)
    // the vocab-supplied path prunes identically (no eager census job)
    val vocab = Some(spark.read.parquet(s"$dir/vocab"))
    val viaVocab = TextIndex.searchAll(
      Seq((0L, Seq("spark", "gardening"))).toDF("q_id", "terms"), "q_id",
      "terms", postings, n, avg, k = 10, vocab = vocab,
      autoPruneMinDf = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(viaVocab === run(Seq("gardening"), None, auto = false))
  }

  test("searchAll ranks STRING doc ids on the heap path with exact scores") {
    // string ids ride the (double, UTF8String) heap since round 11 — the
    // rank exchange stays bounded for url-keyed corpora, and the scores
    // must still match the single-query search exactly
    val named = corpus.withColumn("doc_id",
      concat(lit("doc-"), col("doc_id")))
    val dir = Files.createTempDirectory("tidx").toString
    TextIndex.build(named, "text", "doc_id", dir, nBuckets = 8)
    val (n, avg, _) = TextIndex.loadStats(spark, dir)
    val res = TextIndex.searchAll(
      Seq((0L, Seq("spark", "vector"))).toDF("q_id", "terms"), "q_id",
      "terms", spark.read.parquet(s"$dir/postings"), n, avg, k = 10)
    assert(res.schema("doc_id").dataType ===
      org.apache.spark.sql.types.StringType)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"string ids must rank on the heap aggregate:\n$plan")
    val got = res.collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    val want = TextIndex.search(spark, dir, Seq("spark", "vector"), k = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got === want)
    assert(got.nonEmpty)
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

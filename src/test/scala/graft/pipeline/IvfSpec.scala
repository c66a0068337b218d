package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  // 3 well-separated clusters around distinct corners, 40 vectors each
  private def clustered(n: Int = 120) = {
    val centers = Array(
      Array(10.0, 0.0, 0.0, 0.0),
      Array(0.0, 10.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 0.0))
    val rows = (0 until n).map { i =>
      val r = new scala.util.Random(i)
      val c = centers(i % 3)
      (i.toLong, Seq.tabulate(dim)(d => (c(d) + r.nextGaussian() * 0.3).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def seedCentroids(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.filter(col("vec_id") < k).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  test("build writes list-partitioned postings and search prunes to probed lists") {
    val dir = Files.createTempDirectory("ivf").toString
    val df = clustered()
    val cents = seedCentroids(df, 3) // one seed per cluster corner
    val n = Ivf.build(df, "embedding", "vec_id", cents, dir)
    assert(n === 120L)
    // physical layout: one directory per list
    val lists = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("list_id=")).map(_.getName).sorted
    assert(lists.length === 3)

    val q = df.filter(col("vec_id") === 0).select("embedding")
      .first().getSeq[Float](0).map(_.toDouble).toArray
    val res = Ivf.search(spark, dir, q, k = 5, nProbe = 1)
    // partition pruning: `list_id IN (probe)` must reach the scan as a
    // PARTITION filter (directory-level skip), not a post-scan predicate
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*list_id[^\\]]*\\].*"),
      s"expected a non-empty list_id partition filter in:\n$plan")
    // every returned id belongs to the query's own cluster (ids ≡ 0 mod 3)
    val ids = res.collect().map(_.getLong(0))
    assert(ids.length === 5 && ids.forall(_ % 3 === 0))
    assert(ids.contains(0L)) // the query itself at cos 1
  }

  test("suggestedCentroids encodes the √N rule with clamps") {
    assert(Ivf.suggestedCentroids(0L) === 16) // min clamp
    assert(Ivf.suggestedCentroids(100L) === 16) // √100 < min
    assert(Ivf.suggestedCentroids(1000000L) === 1000)
    assert(Ivf.suggestedCentroids(1L << 40) === (1 << 16)) // max clamp
    assert(Ivf.suggestedCentroids(1000000L, max = 500) === 500)
  }

  test("buildAuto picks √N lists and the index round-trips through search") {
    val dir = Files.createTempDirectory("ivf_auto").toString
    val df = clustered()
    val (cents, n) = Ivf.buildAuto(df, "embedding", "vec_id", dir, iters = 3)
    assert(n === 120L)
    assert(cents.length === Ivf.suggestedCentroids(120L)) // √120 ≈ 11 → min 16
    // stored centroids match the returned matrix
    assert(Ivf.loadCentroids(spark, dir).map(_.toSeq).toSeq ===
      cents.map(_.toSeq).toSeq)
    // a same-cluster query resolves through the auto-built index
    val q = df.filter(col("vec_id") === 0).select("embedding")
      .first().getSeq[Float](0).map(_.toDouble).toArray
    val ids = Ivf.search(spark, dir, q, k = 5, nProbe = 3)
      .collect().map(_.getLong(0))
    assert(ids.contains(0L))
  }

  test("search parity with ivfTopK on the same quantizer") {
    val dir = Files.createTempDirectory("ivf").toString
    val df = clustered()
    val cents = seedCentroids(df, 8)
    Ivf.build(df, "embedding", "vec_id", cents, dir)
    val q = df.filter(col("vec_id") === 1).select("embedding")
      .first().getSeq[Float](0).map(_.toDouble).toArray
    val a = Ivf.search(spark, dir, q, k = 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = Similarity.ivfTopK(df, "embedding", "vec_id", q, cents, 10, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("searchAll matches per-query ivfTopK for every query") {
    val df = clustered()
    val cents = seedCentroids(df, 8)
    val queries = df.filter(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val batch = Ivf.searchAll(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, k = 4, nProbe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    (0 until 6).foreach { qi =>
      val q = df.filter(col("vec_id") === qi).select("embedding")
        .first().getSeq[Float](0).map(_.toDouble).toArray
      val single = Similarity.ivfTopK(df, "embedding", "vec_id", q, cents, 4, 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val got = batch(qi.toLong).sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3))
      assert(got.toSeq === single.toSeq, s"query $qi")
    }
  }

  test("searchAll over pre-assigned postings equals the on-the-fly path") {
    val dir = Files.createTempDirectory("ivf").toString
    val df = clustered()
    val cents = seedCentroids(df, 8)
    Ivf.build(df, "embedding", "vec_id", cents, dir)
    val postings = spark.read.parquet(s"$dir/postings")
    val queries = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    val a = norm(Ivf.searchAll(queries, "q_vec", "q_id",
      postings, "embedding", "vec_id", cents, k = 3, nProbe = 2, preAssigned = true))
    val b = norm(Ivf.searchAll(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, k = 3, nProbe = 2))
    assert(a.toSeq === b.toSeq)
    // the mega-batch escape hatch (shuffle join instead of broadcast)
    // is output-identical
    val c = norm(Ivf.searchAll(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, k = 3, nProbe = 2,
      broadcastQueries = false))
    assert(c.toSeq === b.toSeq)
  }

  test("bruteTopKBatch equals per-query bruteForceTopK; full-probe IVF recall is 1.0") {
    val df = clustered()
    val queries = df.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteTopKBatch(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", k = 5)
    val byQ = exact.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).groupBy(_._1)
    (0 until 5).foreach { qi =>
      val q = df.filter(col("vec_id") === qi).select("embedding")
        .first().getSeq[Float](0).map(_.toDouble).toArray
      val single = Similarity.bruteForceTopK(df, "embedding", "vec_id", q, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val got = byQ(qi.toLong).sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3))
      assert(got.toSeq === single.toSeq, s"query $qi")
    }
    // probing every list makes IVF exhaustive → recall exactly 1.0
    val cents = seedCentroids(df, 3)
    val full = Ivf.searchAll(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, k = 5, nProbe = 3)
    val r = Similarity.recallAgainst(full, exact, "q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(r.size === 5 && r.values.forall(_ === 1.0))
    // fewer probes can only lose candidates: recall in [0, 1]
    val one = Ivf.searchAll(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, k = 5, nProbe = 1)
    val r1 = Similarity.recallAgainst(one, exact, "q_id", "vec_id")
      .collect().map(_.getDouble(1))
    assert(r1.length === 5 && r1.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("searchAllPq matches per-query ivfPqTopK for every query") {
    val df = clustered()
    val cents = seedCentroids(df, 8)
    // seed codebooks: dim 4, m 2 → subDim 2 slices of the 8 seeds
    val model = Pq.Model(4, 2,
      Array.tabulate(2)(s => seedCentroids(df, 8).map(_.slice(s * 2, (s + 1) * 2))))
    val queries = df.filter(col("vec_id") < 6)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val batch = Ivf.searchAllPq(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, model, k = 4, nProbe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val index = Pq.ivfPqIndex(df, "embedding", cents, model)
    (0 until 6).foreach { qi =>
      val q = df.filter(col("vec_id") === qi).select("embedding")
        .first().getSeq[Float](0).map(_.toDouble).toArray
      val single = Pq.ivfPqTopK(index, "vec_id", q, cents, model,
        nProbe = 2, n = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val got = batch(qi.toLong).sortBy(t => (t._3, t._2)).map(t => (t._2, t._3))
      assert(got.toSeq === single.toSeq, s"query $qi")
    }
  }

  test("build with a PQ model stores codes, and preEncoded search reads them") {
    val dir = Files.createTempDirectory("ivfpq").toString
    val df = clustered()
    val cents = seedCentroids(df, 3)
    val model = Pq.Model(4, 2,
      Array.tabulate(2)(s => seedCentroids(df, 8).map(_.slice(s * 2, (s + 1) * 2))))
    Ivf.build(df, "embedding", "vec_id", cents, dir, pqModel = Some(model))
    val postings = spark.read.parquet(s"$dir/postings")
    // the lake holds codes, never the float vectors
    assert(postings.columns.toSet === Set("vec_id", "pq_code", "list_id"))
    val queries = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2))
    val a = norm(Ivf.searchAllPq(queries, "q_vec", "q_id",
      postings, "embedding", "vec_id", cents, model, k = 3, nProbe = 2,
      preEncoded = true))
    val b = norm(Ivf.searchAllPq(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, model, k = 3, nProbe = 2))
    assert(a.toSeq === b.toSeq)
  }

  test("suggestedProbes encodes √nLists; it is the batch-search default") {
    assert(Ivf.suggestedProbes(0) === 1)
    assert(Ivf.suggestedProbes(1) === 1)
    assert(Ivf.suggestedProbes(16) === 4)
    assert(Ivf.suggestedProbes(1024) === 32)
    assert(Ivf.suggestedProbes(2, min = 3) === 3)
    // default-nProbe call ≡ the explicit suggestedProbes(nLists) call
    val df = clustered()
    val cents = seedCentroids(df, 8)
    val queries = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(norm(Ivf.searchAll(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, k = 3)) ===
      norm(Ivf.searchAll(queries, "q_vec", "q_id",
        df, "embedding", "vec_id", cents, k = 3,
        nProbe = Ivf.suggestedProbes(8))))
  }

  test("searchAllPq re-rank: exact cosine over the ADC shortlist, both " +
      "vector sources, recall never below the plain ADC cut") {
    val df = clustered()
    val cents = seedCentroids(df, 3)
    val model = Pq.Model(4, 2,
      Array.tabulate(2)(s => seedCentroids(df, 8).map(_.slice(s * 2, (s + 1) * 2))))
    val queries = df.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    val reranked = Ivf.searchAllPq(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, model, k = 3, nProbe = 2, reRank = 10)
    assert(reranked.columns.toSeq === Seq("q_id", "vec_id", "cos"))
    // hand-built expectation: exact cosine re-rank of the ADC top-10
    val shortlist = Ivf.searchAllPq(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, model, k = 10, nProbe = 2)
      .select(col("q_id"), col("vec_id"))
    val rescored = df.join(shortlist, Seq("vec_id"))
      .join(queries, Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Dedup.cosine(col("q_vec"), col("embedding")), 6).as("cos"))
    val want = TopKAgg.rankTopK(rescored, "q_id", "vec_id", "cos", 3)
    assert(norm(reranked) === norm(want))
    // codes-only lake: preEncoded + rawVectors gives the same answer
    val dir = Files.createTempDirectory("ivfpq_rr").toString
    Ivf.build(df, "embedding", "vec_id", cents, dir, pqModel = Some(model))
    val postings = spark.read.parquet(s"$dir/postings")
    val viaLake = Ivf.searchAllPq(queries, "q_vec", "q_id",
      postings, "embedding", "vec_id", cents, model, k = 3, nProbe = 2,
      preEncoded = true, reRank = 10, rawVectors = Some(df))
    assert(norm(viaLake) === norm(reranked))
    // preEncoded without rawVectors must fail loudly, not return wrong rows
    val e = intercept[IllegalArgumentException](
      Ivf.searchAllPq(queries, "q_vec", "q_id",
        postings, "embedding", "vec_id", cents, model, k = 3, nProbe = 2,
        preEncoded = true, reRank = 10))
    assert(e.getMessage.contains("rawVectors"))
    // re-rank is the recall-recovery stage: against the exact baseline it
    // can only improve (or match) the plain ADC cut on every query
    val exact = Similarity.bruteTopKBatch(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", k = 3)
    def recall(d: org.apache.spark.sql.DataFrame) =
      Similarity.recallAgainst(d, exact, "q_id", "vec_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val rAdc = recall(Ivf.searchAllPq(queries, "q_vec", "q_id",
      df, "embedding", "vec_id", cents, model, k = 3, nProbe = 2))
    val rRr = recall(reranked)
    rRr.foreach { case (q, r) => assert(r >= rAdc(q), s"query $q") }
  }

  test("merge equals a from-scratch build: postings and search results") {
    val dirInc = Files.createTempDirectory("ivf_inc").toString
    val dirAll = Files.createTempDirectory("ivf_all").toString
    val df = clustered()
    val cents = seedCentroids(df, 3)
    Ivf.build(df.filter(col("vec_id") < 60), "embedding", "vec_id", cents, dirInc)
    val n = Ivf.merge(df.filter(col("vec_id") >= 60), "embedding", "vec_id", dirInc)
    Ivf.build(df, "embedding", "vec_id", cents, dirAll)
    assert(n === 60L) // appended delta, not the total
    // mismatched payload (codes-only delta into a vector lake) fails loudly
    val model = Pq.Model(4, 2,
      Array.tabulate(2)(s => seedCentroids(df, 8).map(_.slice(s * 2, (s + 1) * 2))))
    val e = intercept[IllegalArgumentException](
      Ivf.merge(df.limit(1), "embedding", "vec_id", dirInc, pqModel = Some(model)))
    assert(e.getMessage.contains("pqModel"))
    def postings(dir: String) =
      spark.read.parquet(s"$dir/postings").select("vec_id", "list_id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(postings(dirInc).toSeq === postings(dirAll).toSeq)
    val q = df.filter(col("vec_id") === 2).select("embedding")
      .first().getSeq[Float](0).map(_.toDouble).toArray
    def run(dir: String) = Ivf.search(spark, dir, q, k = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(run(dirInc).toSeq === run(dirAll).toSeq)
  }

  test("nearestK expression: ascending distance, ties to the lower id") {
    val cents = Array(
      Array(0.0, 0.0), Array(1.0, 0.0), Array(1.0, 0.0), Array(5.0, 0.0))
    val df = Seq((0L, Seq(0.9f, 0.0f))).toDF("id", "v")
    val got = df.select(KMeans.assignK(df, "v", cents, 3).as("p"))
      .first().getSeq[Int](0)
    // distances: c0=0.81, c1=0.01, c2=0.01 (tie → lower id first), c3≈16.8
    assert(got === Seq(1, 2, 0))
  }

  test("nearestK on a NaN-bearing vector falls back to index order" +
      " instead of crashing (all distances NaN)") {
    val cents = Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(5.0, 0.0))
    // one NaN element poisons EVERY centroid distance; the selection
    // loop's comparisons never fire — this used to die with taken(-1)
    val df = Seq((0L, Seq(Float.NaN, 0.0f))).toDF("id", "v")
    val got = df.select(KMeans.assignK(df, "v", cents, 2).as("p"))
      .first().getSeq[Int](0)
    assert(got === Seq(0, 1)) // lowest untaken indices, like nearest()'s 0
    // and the single-probe form agrees on the same input
    val one = df.select(KMeans.assign(df, "v", cents).as("c"))
      .first().getInt(0)
    assert(one === 0)
  }
}

package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated 4-D blobs, deterministic jitter
  private def blobs(perCluster: Int = 40) = {
    val centers = Seq(
      Array(0.0, 0.0, 0.0, 0.0),
      Array(10.0, 10.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 10.0))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until perCluster
    } yield {
      val r = new scala.util.Random(ci * 1000 + j)
      val vec = c.map(x => (x + r.nextGaussian() * 0.3).toFloat)
      ((ci * perCluster + j).toLong, vec.toSeq)
    }
    (rows.toDF("vec_id", "embedding"), centers)
  }

  test("NearestCentroidExpr matches ivfAssign (interpreted and codegen)") {
    val (df, centers) = blobs()
    val cents = centers.toArray
    val native = KMeans.assign(df, "embedding", cents)
    val literal = Similarity.ivfAssign(col("embedding"), cents)
    assert(df.filter(native =!= literal).count() === 0L)
    // interpreted path (codegen off) agrees too
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(df.filter(native =!= literal).count() === 0L)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("VectorSumAgg stats match the posexplode groupBy form") {
    val (df, centers) = blobs()
    val stats = KMeans.clusterStats(df, "embedding", centers.toArray)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val expl = df
      .withColumn("c", Similarity.ivfAssign(col("embedding"), centers.toArray))
      .select(col("c"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("c", "d").agg(sum(col("v").cast("double")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    expl.foreach { r =>
      val (c, d) = (r.getInt(0), r.getInt(1))
      assert(math.abs(stats(c)(d) - r.getDouble(2)) < 1e-9, s"sum ($c,$d)")
      assert(stats(c)(4).toLong === r.getLong(3), s"count $c")
    }
  }

  test("fit recovers blob centers from a deliberately bad init") {
    val (df, centers) = blobs()
    // one seed near each blob but visibly off-center (the shape a
    // sample init produces); fit must converge onto the true means
    val init = Array(
      Array(0.5, 0.2, -0.1, 0.4), Array(9.0, 11.0, 0.3, -0.2),
      Array(0.2, -0.3, 9.5, 10.5))
    val (fitted, iters, shift) = KMeans.fit(df, "embedding", init, maxIter = 20)
    assert(iters < 20 && shift <= 1e-6, "should converge early")
    fitted.zip(centers).foreach { case (f, c) =>
      val d = math.sqrt(f.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(d < 0.4, s"centroid off by $d")
    }
  }

  test("fitAuto refines the driver-sample init over the full corpus") {
    val (df, centers) = blobs()
    val (fitted, _, _) = KMeans.fitAuto(df, "embedding", "vec_id", k = 3)
    // every true center has exactly one fitted centroid within 0.4
    centers.foreach { c =>
      val hits = fitted.count(f =>
        math.sqrt(f.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum) < 0.4)
      assert(hits === 1, s"center ${c.toSeq} matched $hits centroids")
    }
  }

  test("empty clusters keep their centroid; null vectors are dropped") {
    val df = Seq(
      (0L, Some(Seq(0.0f, 0.0f))), (1L, Some(Seq(0.2f, 0.1f))),
      (2L, None)).toDF("vec_id", "embedding")
    val far = Array(Array(0.1, 0.05), Array(100.0, 100.0))
    val (fitted, _, _) = KMeans.fit(df, "embedding", far, maxIter = 3)
    assert(fitted(1).toSeq === Seq(100.0, 100.0), "empty cluster moved")
    val stats = KMeans.clusterStats(df, "embedding", far).collect()
    // count slot is index `dim` (the buffer carries Σ|x|² after it)
    assert(stats.map(_.getSeq[Double](1)(2).toLong).sum === 2L, "null row counted")
  }

  test("inertia matches driver SSE and decreases under fit") {
    val (df, centers) = blobs()
    val init = Array(
      Array(1.0, 1.0, 1.0, 1.0), Array(8.0, 8.0, 1.0, 1.0),
      Array(1.0, 1.0, 8.0, 8.0))
    val before = KMeans.inertia(df, "embedding", init)
    val (fitted, _, _) = KMeans.fit(df, "embedding", init, maxIter = 10)
    val after = KMeans.inertia(df, "embedding", fitted)
    assert(after < before, s"fit should reduce inertia: $before -> $after")
    // driver-side SSE against the fitted centroids agrees
    val data = df.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val sse = data.map { v =>
      fitted.map(c => v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
    }.sum
    assert(math.abs(after - sse) / sse < 1e-9, s"inertia $after vs SSE $sse")
  }

  test("step emits per-(cluster, dim) means consistent with fit's first round") {
    val (df, centers) = blobs()
    val out = KMeans.step(df, "embedding", centers.toArray)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(out.size === 3 * 4)
    // mean of cluster 1 dim 0 should sit near 10
    assert(math.abs(out((1, 0))._1 - 10.0) < 0.3)
    assert(out.values.map(_._2).toSet === Set(40L))
    // a wrong-length vector fails loudly
    val bad = Seq((0L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      KMeans.step(bad, "embedding", centers.toArray).collect()
    }
    assert(e.getMessage != null)
  }
}

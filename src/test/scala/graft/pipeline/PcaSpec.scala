package graft.pipeline

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 3-D points stretched along (1, 1, 0)/√2 with small isotropic noise
  private def stretched(n: Int = 200) = {
    val rows = (0 until n).map { i =>
      val r = new scala.util.Random(i)
      val t = r.nextGaussian() * 5.0
      (i.toLong, Seq(
        (t / math.sqrt(2) + r.nextGaussian() * 0.1 + 1.0).toFloat,
        (t / math.sqrt(2) + r.nextGaussian() * 0.1 - 2.0).toFloat,
        (r.nextGaussian() * 0.1 + 0.5).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("one-pass covariance matches the naive two-pass computation") {
    val df = stretched(50)
    val (cov, mean, n) = Pca.covariance(df, "embedding", 3)
    assert(n === 50L)
    val data = df.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val naiveMean = Array.tabulate(3)(d => data.map(_(d)).sum / data.length)
    mean.zip(naiveMean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    for (i <- 0 until 3; j <- 0 until 3) {
      val naive = data.map(v => (v(i) - naiveMean(i)) * (v(j) - naiveMean(j)))
        .sum / data.length
      assert(math.abs(cov(i)(j) - naive) < 1e-9, s"cov($i,$j)")
    }
  }

  test("symmetricEigen solves a known matrix and reconstructs it") {
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (vals, vecs) = Pca.symmetricEigen(a)
    assert(math.abs(vals(0) - 3.0) < 1e-10 && math.abs(vals(1) - 1.0) < 1e-10)
    // eigenvectors up to sign: (1,1)/√2 and (1,-1)/√2
    assert(math.abs(math.abs(vecs(0)(0)) - 1 / math.sqrt(2)) < 1e-10)
    assert(math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-10)
    assert(math.abs(vecs(1)(0) + vecs(1)(1)) < 1e-10)
    // A = Σ λ_k v_k v_kᵀ
    for (i <- 0 until 2; j <- 0 until 2) {
      val rec = (0 until 2).map(k => vals(k) * vecs(k)(i) * vecs(k)(j)).sum
      assert(math.abs(rec - a(i)(j)) < 1e-10, s"recon($i,$j)")
    }
  }

  test("fit finds the stretch direction; projection decorrelates") {
    val df = stretched()
    val (mean, comps, vals) = Pca.fit(df, "embedding", dim = 3, k = 2)
    // top component aligns with (1,1,0)/√2 up to sign
    val c0 = comps(0)
    val align = math.abs(c0(0) / math.sqrt(2) + c0(1) / math.sqrt(2))
    assert(align > 0.99, s"top component ${c0.toSeq} misaligned")
    assert(vals(0) > 10 * vals(1), "stretch should dominate")
    // projected coordinates: var(pc0) ≈ λ0, cov(pc0, pc1) ≈ 0
    val proj = Pca.addProjection(df, "embedding", mean, comps)
      .select("pca").collect().map(_.getSeq[Double](0).toArray)
    val m0 = proj.map(_(0)).sum / proj.length
    val m1 = proj.map(_(1)).sum / proj.length
    val v0 = proj.map(p => (p(0) - m0) * (p(0) - m0)).sum / proj.length
    val c01 = proj.map(p => (p(0) - m0) * (p(1) - m1)).sum / proj.length
    assert(math.abs(v0 - vals(0)) / vals(0) < 1e-6)
    assert(math.abs(c01) < 1e-6 * vals(0))
  }

  test("whitened projection has unit variance per coordinate") {
    val df = stretched()
    val (mean, comps, vals) = Pca.fit(df, "embedding", dim = 3, k = 2)
    val white = Pca.whiteningComponents(comps, vals)
    val proj = Pca.addProjection(df, "embedding", mean, white)
      .select("pca").collect().map(_.getSeq[Double](0).toArray)
    (0 until 2).foreach { d =>
      val m = proj.map(_(d)).sum / proj.length
      val v = proj.map(p => (p(d) - m) * (p(d) - m)).sum / proj.length
      assert(math.abs(v - 1.0) < 1e-6, s"coordinate $d variance $v")
    }
  }

  test("exactMoments is bit-identical across partitionings and matches " +
      "a sequential integer computation") {
    val df = stretched(120)
    // sequential ground truth over the same quantization
    val data = df.select("embedding").collect()
      .map(_.getSeq[Float](0).map(f => math.floor(f.toDouble * (1L << 20)).toLong).toArray)
    val expSx = Array.tabulate(3)(d => data.map(_(d)).sum)
    val expSxy = (for (i <- 0 until 3; j <- i until 3)
      yield data.map(v => v(i) * v(j)).sum).toArray
    for (parts <- Seq(1, 7, 32)) {
      val (sxy, sx, n) = Pca.exactMoments(df.repartition(parts), "embedding", 3)
      assert(n === 120L, s"parts=$parts")
      assert(sx.toSeq === expSx.toSeq, s"parts=$parts sums")
      assert(sxy.toSeq === expSxy.toSeq, s"parts=$parts products")
    }
    // covariance recoverable to quantization precision (~2^-20 per axis)
    val (sxy, sx, n) = Pca.exactMoments(df, "embedding", 3)
    val (cov, _, _) = Pca.covariance(df, "embedding", 3)
    val s2 = (1L << 20).toDouble * (1L << 20).toDouble
    var p = 0
    for (i <- 0 until 3; j <- i until 3) {
      val rec = (sxy(p).toDouble - sx(i).toDouble * sx(j).toDouble / n) / n / s2
      assert(math.abs(rec - cov(i)(j)) < 1e-4, s"cov($i,$j) $rec vs ${cov(i)(j)}")
      p += 1
    }
  }

  test("null vectors are dropped; wrong length fails loudly") {
    val df = Seq(
      (0L, Some(Seq(1.0f, 2.0f))), (1L, Some(Seq(3.0f, 4.0f))),
      (2L, None)).toDF("vec_id", "embedding")
    val (_, _, n) = Pca.covariance(df, "embedding", 2)
    assert(n === 2L)
    val e = intercept[Exception] { Pca.covariance(df, "embedding", 3) }
    assert(e.getMessage != null)
  }
}

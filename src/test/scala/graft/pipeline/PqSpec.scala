package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 16-D vectors drawn around 8 well-separated anchors (so codebooks of
  // k = 8 per subspace can represent the data well)
  private def corpus(n: Int = 400) = {
    val anchors = Array.tabulate(8, 16)((a, d) =>
      math.sin(a * 16 + d) * 10.0)
    val rows = (0 until n).map { i =>
      val r = new scala.util.Random(i)
      val a = anchors(i % 8)
      (i.toLong, a.map(x => (x + r.nextGaussian() * 0.5).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("encode matches the driver-side nearest sub-centroid") {
    val df = corpus(100)
    val model = Pq.fitOnSample(df, "embedding", "vec_id", dim = 16, m = 4, k = 8)
    assert(model.subDim === 4 && model.k === 8)
    val encoded = Pq.encode(df, "embedding", model)
      .select("vec_id", "embedding", "pq_code").collect()
    encoded.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val code = r.getSeq[Int](2).toArray
      code.zipWithIndex.foreach { case (c, s) =>
        val sub = v.slice(s * 4, (s + 1) * 4)
        val dists = model.codebooks(s).map(cb =>
          cb.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum)
        assert(dists(c) === dists.min, s"vec ${r.getLong(0)} sub $s")
      }
    }
  }

  test("quantization error is small relative to vector norm on clustered data") {
    val df = corpus()
    val model = Pq.fitOnSample(df, "embedding", "vec_id", dim = 16, m = 4, k = 8)
    val rows = Pq.encode(df, "embedding", model)
      .select("embedding", "pq_code").collect()
    val (errSum, normSum) = rows.foldLeft((0.0, 0.0)) { case ((e, nn), r) =>
      val v = r.getSeq[Float](0).map(_.toDouble).toArray
      val rec = Pq.decode(r.getSeq[Int](1).toArray, model)
      val err = v.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      (e + err, nn + v.map(x => x * x).sum)
    }
    assert(errSum / normSum < 0.02, s"relative sq error ${errSum / normSum}")
  }

  test("ADC ranks the query's cluster first (PQ's actual guarantee)") {
    // tight clusters collapse to ONE code per class, so ADC cannot rank
    // WITHIN a cluster — its guarantee is that every same-cluster member
    // scores below every cross-cluster one
    val df = corpus()
    val model = Pq.fitOnSample(df, "embedding", "vec_id", dim = 16, m = 4, k = 8)
    val query = df.filter(col("vec_id") === 3).select("embedding")
      .first().getSeq[Float](0).map(_.toDouble).toArray
    val encoded = Pq.encode(df, "embedding", model)
    // top-10 all from the query's anchor class (3 mod 8)
    val adc10 = Pq.adcTopK(encoded, "pq_code", "vec_id", query, model, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(adc10.forall(id => id % 8 === 3L), s"off-cluster hits: $adc10")
    // top-50 is EXACTLY the 50 class members: class recall = 1.0
    val adc50 = Pq.adcTopK(encoded, "pq_code", "vec_id", query, model, 50)
      .select("vec_id").as[Long].collect().toSet
    assert(adc50 === (0 until 400).filter(_ % 8 == 3).map(_.toLong).toSet)
    // and every same-class ADC distance < every cross-class one
    val dists = Pq.adcTopK(encoded, "pq_code", "vec_id", query, model, 400)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val (same, cross) = dists.partition(_._1 % 8 == 3L)
    assert(same.map(_._2).max < cross.map(_._2).min)
  }

  test("IVF-PQ probe agrees with the full ADC scan when it covers the list") {
    val df = corpus()
    val model = Pq.fitOnSample(df, "embedding", "vec_id", dim = 16, m = 4, k = 8)
    // coarse quantizer = distributed k-means over the corpus
    val (coarse, _, _) = KMeans.fitAuto(df, "embedding", "vec_id", k = 8)
    val index = Pq.ivfPqIndex(df, "embedding", coarse, model)
    val query = df.filter(col("vec_id") === 3).select("embedding")
      .first().getSeq[Float](0).map(_.toDouble).toArray
    val probed = Pq.ivfPqTopK(index, "vec_id", query, coarse, model,
      nProbe = 2, n = 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val full = Pq.adcTopK(Pq.encode(df, "embedding", model),
      "pq_code", "vec_id", query, model, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(probed.toSeq === full.toSeq,
      "nProbe=2 on 8 tight blobs must cover the winning list")
    // nProbe = all lists is exhaustive by construction
    val all = Pq.ivfPqTopK(index, "vec_id", query, coarse, model,
      nProbe = 8, n = 10).collect().map(_.getLong(0))
    assert(all.toSeq === full.map(_._1).toSeq)
  }

  test("model validation fails loudly") {
    val df = corpus(20)
    val e = intercept[IllegalArgumentException] {
      Pq.fitOnSample(df, "embedding", "vec_id", dim = 16, m = 5, k = 4)
    }
    assert(e.getMessage.contains("divide"))
  }
}

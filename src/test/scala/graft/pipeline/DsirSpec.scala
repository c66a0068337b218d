package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DSIR importance resampling: hashed n-gram features, λ estimation,
  * weight scoring, Gumbel-top-k selection.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  /** Driver-side mirror of [[Dsir.featureBuckets]]. */
  private def featsOf(text: String): Seq[Int] = {
    val toks = text.trim.split("\\s+").toSeq
    val unis = toks.map(QualityModel.bucket(_, B))
    val bis = toks.sliding(2).filter(_.length == 2)
      .map(p => QualityModel.bucket(p.mkString(" "), B)).toSeq
    unis ++ bis
  }

  test("featureBuckets: unigrams + bigrams in one bucket space") {
    val df = Seq("alpha beta gamma", "solo", "  padded  out  ")
      .toDF("text")
      .select(Dsir.featureBuckets(col("text"), B).as("f"))
    val got = df.as[Seq[Int]].collect()
    assert(got(0) === featsOf("alpha beta gamma")) // 3 unis + 2 bis
    assert(got(0).length === 5)
    assert(got(1) === featsOf("solo")) // single token: no bigrams
    assert(got(1).length === 1)
    assert(got(2) === featsOf("padded out")) // trim + \s+ split
    assert(got(2).length === 3)
  }

  test("importanceTable: target == raw gives identically zero λ") {
    val df = Seq((1L, "a b c"), (2L, "d e f")).toDF("id", "text")
    val lam = Dsir.importanceTable(df, "text", lit(true), B)
    assert(lam.length === B)
    assert(lam.forall(_ == 0.0)) // p_t and p_r computed from the same counts
  }

  test("one-pass and two-corpus λ tables agree") {
    val df = (1 to 60)
      .map(i => (i.toLong, if (i % 3 == 0) s"wiki art$i" else s"spam junk$i",
        i % 3 == 0))
      .toDF("id", "text", "is_t")
    val onePass = Dsir.importanceTable(df, "text", col("is_t"), B)
    val twoScan =
      Dsir.importanceTable(df, df.filter(col("is_t")), "text", B, 0.5)
    assert(onePass.toSeq === twoScan.toSeq)
  }

  test("weights: target-like docs score above off-target docs") {
    // two disjoint vocabularies; target slice = the "clean" mode
    val clean = (1 to 40).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog", true))
    val noisy = (41 to 80).map(i =>
      (i.toLong, "buy cheap pills now click here free offer", false))
    val df = (clean ++ noisy).toDF("id", "text", "is_t")
    val w = Dsir.importanceWeights(df, "id", "text", col("is_t"), B)
      .as[(Long, Double)].collect().toMap
    val cleanW = clean.map(r => w(r._1)).distinct
    val noisyW = noisy.map(r => w(r._1)).distinct
    assert(cleanW.length === 1 && noisyW.length === 1) // identical texts
    assert(cleanW.head > 0.0) // target-like: log-ratio favors
    assert(noisyW.head < 0.0)
    assert(cleanW.head > noisyW.head)
  }

  test("weight column matches a driver-side recompute") {
    val df = (1 to 30)
      .map(i => (i.toLong, s"tok$i shared word tok${i % 7}", i % 2 == 0))
      .toDF("id", "text", "is_t")
    val lam = Dsir.importanceTable(df, "text", col("is_t"), B)
    val got = df
      .select(col("id"),
        Dsir.importanceWeightColumn(col("text"), lam).as("w"))
      .as[(Long, Double)].collect().toMap
    df.select("id", "text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        val exp = featsOf(text).map(lam(_)).sum
        assert(math.abs(got(id) - exp) < 1e-9, s"doc $id")
    }
  }

  test("resampleByWeight: deterministic, weight-biased, exact size") {
    val df = (1 to 400)
      .map(i => (i.toLong, if (i <= 200) 3.0 else -3.0))
      .toDF("id", "logw")
    val a = Dsir.resampleByWeight(df, "id", "logw", 100)
      .select("id").as[Long].collect().toSet
    val b = Dsir.resampleByWeight(df, "id", "logw", 100)
      .select("id").as[Long].collect().toSet
    assert(a === b) // reproducible from data alone
    assert(a.size === 100)
    // heavy mode (exp(6) ≈ 400× likelier per doc) dominates the sample
    assert(a.count(_ <= 200) > 85)
    assert(a.count(_ > 200) > 0 || a.count(_ <= 200) === 100)
  }

  test("select: end-to-end keeps mostly target-like docs") {
    val df = ((1 to 100).map(i =>
      (i.toLong, "encyclopedia article with careful prose", true)) ++
      (101 to 200).map(i =>
        (i.toLong, "click spam free offer winner prize", false)))
      .toDF("id", "text", "is_t")
    val kept = Dsir.select(df, "id", "text", col("is_t"), 50, B)
    assert(kept.count() === 50)
    assert(kept.columns.contains("dsir_logw"))
    val ids = kept.select("id").as[Long].collect()
    assert(ids.count(_ <= 100) > 45) // near-all from the target-like mode
  }
}

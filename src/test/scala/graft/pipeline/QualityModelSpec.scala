package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // held-out docs (the last two of each list) recombine TRAINING
  // vocabulary — a hashed bag-of-words model generalizes through shared
  // tokens, not unseen ones
  private val goodDocs = Seq(
    "the committee published its findings after a careful review of the evidence",
    "researchers measured the energy spectrum across a wide range of momenta",
    "a clear explanation of the method appears in the second chapter",
    "the results were consistent with earlier work on similar materials",
    "the committee measured the evidence across a wide range of materials",
    "a careful review of the method appears consistent with earlier findings")
  private val badDocs = Seq(
    "zzzz zzzz zzzz zzzz zzzz zzzz zzzz zzzz",
    "buy buy buy cheap cheap cheap now now now click click click",
    "qwkx jfpd mmvz xxlo pqrs ttuu vvww yyzz aabb ccdd",
    "aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb",
    "zzzz aaaa zzzz bbbb cheap cheap click click qwkx mmvz",
    "buy now buy now zzzz zzzz aaaa bbbb ttuu vvww")

  test("driver tokenHash matches the portableTokenHash column") {
    val toks = Seq("", "a", "the", "committee", "zzzz", "x1!",
      "0123456789abcdef", "Straße", "naïve", " lead", "ONE-two_three")
    val fromCol = toks.toDF("t")
      .select(TextOps.portableTokenHash(col("t")).as("h"))
      .as[Long].collect()
    toks.zip(fromCol).foreach { case (t, h) =>
      assert(QualityModel.tokenHash(t) === h, s"token '$t'")
    }
  }

  test("scoreDoc matches scoreColumn to 1 ulp on the formula weights") {
    val w = graft.SparkEntry.qualityScoreWeights
    val docs = (goodDocs ++ badDocs :+ "" :+ "   ").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val scored = QualityModel.scoreQuality(docs, "text", w, 0.1)
      .select("doc_id", "text", "q_score")
      .collect()
    scored.foreach { r =>
      // Math.exp is JIT-intrinsified: interpreter vs C2 results may
      // differ by 1 ulp, so exact equality is not a JVM guarantee
      val expect = QualityModel.scoreDoc(r.getString(1), w, 0.1)
      assert(math.abs(expect - r.getDouble(2)) <= math.ulp(expect),
        s"doc ${r.getLong(0)}: $expect vs ${r.getDouble(2)}")
    }
  }

  test("train separates held-out good from bad documents") {
    val trainSet =
      goodDocs.take(4).map(_ -> 1.0) ++ badDocs.take(4).map(_ -> 0.0)
    val (w, b) = QualityModel.train(trainSet.toArray, numBuckets = 256,
      iters = 500)
    // training set separates
    trainSet.foreach { case (t, y) =>
      val p = QualityModel.scoreDoc(t, w, b)
      assert(if (y > 0.5) p > 0.6 else p < 0.4, s"train doc '$t' -> $p")
    }
    // held-out docs score on the right side (shared vocabulary tokens
    // carry the signal through the hashed buckets)
    val heldGood = goodDocs.drop(4).map(QualityModel.scoreDoc(_, w, b))
    val heldBad = badDocs.drop(4).map(QualityModel.scoreDoc(_, w, b))
    assert(heldGood.min > heldBad.max,
      s"held-out overlap: good=$heldGood bad=$heldBad")
  }

  test("trainOnSample end-to-end over a labeled DataFrame") {
    val df = (goodDocs.map(_ -> 1) ++ badDocs.map(_ -> 0)).zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "label")
    val (w, b) = QualityModel.trainOnSample(df, "text", "label",
      numBuckets = 256, sampleN = 100)
    val scored = QualityModel.scoreQuality(df, "text", w, b)
      .select(col("label"), col("q_score")).collect()
    val (good, bad) = scored.partition(_.getInt(0) == 1)
    assert(good.map(_.getDouble(1)).min > bad.map(_.getDouble(1)).max)
  }
}

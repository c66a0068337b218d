package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality classifier — the fasttext-shaped model
  * real pipelines use to score web documents (Joulin et al. 2016,
  * arXiv:1607.01759: bag of hashed tokens → linear layer → sigmoid; the
  * quality-filter recipe of GPT-3/CCNet-style corpus curation). The
  * heuristic signals ([[TextOps.qualityColumns]], gopher rules) are
  * fixed formulas; this is the TRAINABLE counterpart: fit on a small
  * labeled sample, score the whole corpus.
  *
  * Split of labor mirrors [[Bpe]] and [[Similarity.kmeansCentroids]]:
  * training runs driver-side on a bounded deterministic sample (logistic
  * regression on a few thousand labels is microseconds — a cluster round
  * would be pure overhead), scoring is a pure column expression — one
  * map-only pass, codegen'd, no UDF. The weight table rides the plan as
  * a SINGLE array literal (one Catalyst node holding an ArrayData, ~8·B
  * bytes — broadcast machinery would buy nothing until B reaches many
  * millions).
  *
  * Features are mean-pooled hashed token buckets:
  * `score = σ(bias + Σ_tok w[hash(tok) mod B] / nTok)` with the
  * SQL-portable [[TextOps.portableTokenHash]], so scores are
  * oracle-checkable end to end.
  */
object QualityModel {

  /** Driver-side mirror of [[TextOps.portableTokenHash]] (parity-tested
    * in QualityModelSpec): two fixed-8 polynomial prefix hashes
    * (out-of-range positions read 0), length-mixed, packed into 62 bits.
    */
  def tokenHash(t: String): Long = {
    val P = TextOps.PolyPrime
    def poly(base: Long): Long = {
      var acc = 0L
      var j = 0
      while (j < 8) {
        // Spark's ascii() = codepoint of the first char of substring(s, j, 1)
        val c = if (j < t.length) t.codePointAt(j).toLong else 0L
        acc = Math.floorMod(acc * base + c, P)
        j += 1
      }
      acc
    }
    val h1 = Math.floorMod(poly(31L) + t.length, P)
    val h2 = Math.floorMod(poly(37L) + t.length.toLong * 7L, P)
    h1 + h2 * (1L << 31)
  }

  def bucket(t: String, numBuckets: Int): Int =
    (tokenHash(t) % numBuckets).toInt // hash is non-negative by construction

  /** Driver-side featurize-and-score, matching [[scoreColumn]] to 1 ulp
    * (Math.exp is JIT-intrinsified; interpreter vs C2 may differ in the
    * last bit).
    */
  def scoreDoc(text: String, weights: Array[Double], bias: Double): Double = {
    val toks = text.trim.split("\\s+")
    var s = 0.0
    toks.foreach(t => s += weights(bucket(t, weights.length)))
    val z = bias + (if (toks.nonEmpty) s / toks.length else 0.0)
    1.0 / (1.0 + math.exp(-z))
  }

  /** Full-batch logistic regression (deterministic: fixed iteration
    * count, no shuffling) over `(text, label∈{0,1})` pairs.
    * Returns `(weights, bias)`.
    */
  def train(
      sample: Array[(String, Double)],
      numBuckets: Int,
      iters: Int = 200,
      lr: Double = 1.0,
      l2: Double = 1e-4,
  ): (Array[Double], Double) = {
    require(sample.nonEmpty, "empty training sample")
    // pre-featurize once: per doc, (bucket -> count/nTok) mean pooling
    val feats = sample.map { case (text, label) =>
      val toks = text.trim.split("\\s+")
      val m = collection.mutable.Map.empty[Int, Double]
      val inv = if (toks.nonEmpty) 1.0 / toks.length else 0.0
      toks.foreach(t => m.updateWith(bucket(t, numBuckets)) {
        case Some(v) => Some(v + inv); case None => Some(inv)
      })
      (m.toArray, label)
    }
    val w = new Array[Double](numBuckets)
    var b = 0.0
    val n = feats.length
    (0 until iters).foreach { _ =>
      val gw = new Array[Double](numBuckets)
      var gb = 0.0
      feats.foreach { case (xs, y) =>
        var z = b
        xs.foreach { case (i, x) => z += w(i) * x }
        val err = 1.0 / (1.0 + math.exp(-z)) - y
        xs.foreach { case (i, x) => gw(i) += err * x }
        gb += err
      }
      var i = 0
      while (i < numBuckets) {
        w(i) -= lr * (gw(i) / n + l2 * w(i)); i += 1
      }
      b -= lr * gb / n
    }
    (w, b)
  }

  /** Sigmoid linear score column: `σ(bias + mean_tok w[hash(tok) mod B])`
    * — pure expressions over the literal weight array, fused into the
    * scan by whole-stage codegen.
    */
  def scoreColumn(text: Column, weights: Array[Double], bias: Double): Column = {
    val b = weights.length.toLong
    val toks = TextOps.tokens(text)
    val sumW = aggregate(
      transform(toks, t =>
        element_at(lit(weights),
          pmod(TextOps.portableTokenHash(t), lit(b)).cast("int") + 1)),
      lit(0.0), (acc, v) => acc + v)
    val z = lit(bias) +
      when(size(toks) > 0, sumW / size(toks)).otherwise(lit(0.0))
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Train on a bounded deterministic sample of the corpus (ordered by
    * the portable text hash, the [[Bpe]] recipe — NOT head-of-scan,
    * which at lake scale is one skewed file) and return the model.
    * `labelCol` must be 0/1 (cast to double).
    */
  def trainOnSample(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      numBuckets: Int = 1 << 12,
      sampleN: Int = 5000,
      iters: Int = 200,
  ): (Array[Double], Double) = {
    val sample = df
      .select(col(textCol).cast("string"), col(labelCol).cast("double"))
      .orderBy(TextOps.portableTokenHash(col(textCol)), col(textCol))
      .limit(sampleN)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    train(sample, numBuckets, iters)
  }

  /** Score every document: adds `q_score` (probability of the positive
    * class). One map-only pass.
    */
  def scoreQuality(df: DataFrame, textCol: String,
      weights: Array[Double], bias: Double): DataFrame =
    df.withColumn("q_score", scoreColumn(col(textCol), weights, bias))
}

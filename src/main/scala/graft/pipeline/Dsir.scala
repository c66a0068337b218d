package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR — Xie et al. 2023,
  * arXiv:2302.03169): select pretraining documents whose hashed n-gram
  * distribution looks like a small high-quality target corpus. Each
  * document gets a log importance weight
  * `log w(x) = Σ_f λ[bucket(f)]`, `λ_b = log p_target(b) − log p_raw(b)`,
  * over unigram+bigram features hashed into `numBuckets` buckets, then
  * the kept subset is drawn with probability ∝ w via Gumbel top-k.
  *
  * Scale shape: λ estimation is ONE corpus scan — the feature explode
  * feeds a single partial-agg exchange keyed on ≤ `numBuckets` bucket
  * ids, and only `numBuckets` (count, count) rows reach the driver, so
  * the collect is corpus-size-independent (the k-means stats-pass
  * recipe). Scoring is a map-only pass: λ rides the plan as ONE array
  * literal (8·B bytes — switch to a broadcast-referencing expression
  * only past many millions of buckets, the [[QualityModel]] rule), and
  * resampling is `TakeOrderedAndProject` (per-partition top-k, no
  * global sort). Nothing here shuffles the corpus itself.
  *
  * Features use the SQL-portable [[TextOps.portableTokenHash]], so
  * weights are DuckDB-oracle-checkable end to end (`q_dsir`).
  */
object Dsir {

  /** Hashed unigram+bigram feature buckets of a text column as
    * `array<int>` (the DSIR paper's feature map: all n-grams share one
    * bucket space). Computed by the native one-pass
    * [[FeatureBucketsExpr]] kernel — bit-identical to
    * [[featureBucketsComposed]] (property-tested) and to the oracle
    * SQL, without the ~80-expression-node polynomial per feature.
    */
  def featureBuckets(text: Column, numBuckets: Int): Column = {
    require(numBuckets > 0, s"numBuckets=$numBuckets")
    org.apache.spark.sql.GraftBridge.column(FeatureBucketsExpr(
      org.apache.spark.sql.GraftBridge.expression(text), numBuckets))
  }

  /** Expression-composed reference form of [[featureBuckets]] — kept as
    * the kernel's parity oracle. The token array is bound ONCE as a
    * lambda variable — referencing the raw `split` subtree inside
    * per-element lambdas would re-evaluate it per element (the O(len²)
    * trap documented on [[TextOps.rollingHashFingerprint]]).
    */
  def featureBucketsComposed(text: Column, numBuckets: Int): Column = {
    require(numBuckets > 0, s"numBuckets=$numBuckets")
    val b = numBuckets.toLong
    def bucketOf(t: Column): Column =
      pmod(TextOps.portableTokenHash(t), lit(b)).cast("int")
    transform(array(TextOps.tokens(text)), toks => {
      val n1 = greatest(size(toks) - 1, lit(0))
      concat(
        transform(toks, t => bucketOf(t)),
        zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
          (a, bb) => bucketOf(concat(a, lit(" "), bb))))
    }).getItem(0)
  }

  /** Smoothed log-probability table from a (bucket → count) map:
    * `log((c_b + α) / (total + α·B))`.
    */
  private def logProbs(
      counts: Map[Int, Long], numBuckets: Int, alpha: Double): Array[Double] = {
    val tot = counts.valuesIterator.sum.toDouble
    Array.tabulate(numBuckets)(i =>
      math.log((counts.getOrElse(i, 0L) + alpha) / (tot + alpha * numBuckets)))
  }

  /** λ table with target and raw sharing ONE corpus: rows matching
    * `targetFilter` are the target slice, every row is raw. Both count
    * vectors come out of a single scan + single bucket-keyed exchange.
    */
  def importanceTable(
      df: DataFrame,
      textCol: String,
      targetFilter: Column,
      numBuckets: Int,
      alpha: Double = 0.5,
  ): Array[Double] = {
    require(alpha > 0, s"alpha=$alpha must be positive (an empty slice " +
      "or bucket would make the log-probability undefined)")
    val rows = df
      .select(explode(featureBuckets(col(textCol), numBuckets)).as("bucket"),
        targetFilter.cast("boolean").as("is_target"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("raw_c"),
        count(when(col("is_target"), lit(1))).as("tgt_c"))
      .collect()
    val raw = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val tgt = rows.map(r => r.getInt(0) -> r.getLong(2)).toMap
    val pt = logProbs(tgt, numBuckets, alpha)
    val pr = logProbs(raw, numBuckets, alpha)
    Array.tabulate(numBuckets)(i => pt(i) - pr(i))
  }

  /** λ table for a target corpus DISTINCT from the raw corpus (the
    * paper's general form — e.g. target = Wikipedia, raw = web crawl).
    * Two scans, each collecting ≤ `numBuckets` rows.
    */
  def importanceTable(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      numBuckets: Int,
      alpha: Double,
  ): Array[Double] = {
    require(alpha > 0, s"alpha=$alpha must be positive (an empty corpus " +
      "or bucket would make the log-probability undefined)")
    def counts(d: DataFrame): Map[Int, Long] = d
      .select(explode(featureBuckets(col(textCol), numBuckets)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pt = logProbs(counts(target), numBuckets, alpha)
    val pr = logProbs(counts(raw), numBuckets, alpha)
    Array.tabulate(numBuckets)(i => pt(i) - pr(i))
  }

  /** `log w` column: Σ over the doc's features of `λ[bucket]`. Pure
    * expressions, fused into the scan by whole-stage codegen.
    */
  def importanceWeightColumn(text: Column, lambda: Array[Double]): Column =
    aggregate(
      transform(featureBuckets(text, lambda.length),
        bkt => element_at(lit(lambda), bkt + 1)),
      lit(0.0), (acc, v) => acc + v)

  /** Per-document DSIR log importance weights against an in-corpus
    * target slice: `(idCol, dsir_logw)`, rounded to 6 (summation-order
    * tolerance — the oracle aggregates in a different order).
    */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetFilter: Column,
      numBuckets: Int = 1 << 13,
      alpha: Double = 0.5,
  ): DataFrame = {
    val lambda = importanceTable(df, textCol, targetFilter, numBuckets, alpha)
    df.select(col(idCol),
      round(importanceWeightColumn(col(textCol), lambda), 6).as("dsir_logw"))
  }

  /** Gumbel-top-k resample: keep the `n` rows maximizing
    * `logw + G(key)` with `G` a deterministic per-key Gumbel draw from
    * the portable hash — equivalent to drawing `n` documents without
    * replacement with probability ∝ exp(logw) (Gumbel-max trick), and
    * reproducible across runs/engines. `orderBy(...).limit(n)` plans as
    * `TakeOrderedAndProject`: per-partition top-n, no global sort.
    */
  def resampleByWeight(
      df: DataFrame,
      idCol: String,
      logwCol: String,
      n: Int,
  ): DataFrame = {
    require(n > 0, s"n=$n")
    val u = (pmod(TextOps.portableTokenHash(col(idCol).cast("string")),
      lit(1000003L)).cast("double") + 0.5) / 1000003.0
    val pri = col(logwCol).cast("double") + -log(-log(u))
    df.orderBy(pri.desc, col(idCol)).limit(n)
  }

  /** End-to-end DSIR: weight against the in-corpus target slice, then
    * Gumbel-top-k down to `n` rows. Returns the kept rows with their
    * `dsir_logw` attached. The weight is computed as a column directly
    * on `df` (no id join — joining the weight frame back would re-scan
    * the corpus and shuffle it by id for nothing), so the whole
    * selection is the λ pass plus ONE map-scored top-k pass.
    */
  def select(
      df: DataFrame,
      idCol: String,
      textCol: String,
      targetFilter: Column,
      n: Int,
      numBuckets: Int = 1 << 13,
      alpha: Double = 0.5,
  ): DataFrame = {
    val lambda = importanceTable(df, textCol, targetFilter, numBuckets, alpha)
    val scored = df.withColumn("dsir_logw",
      round(importanceWeightColumn(col(textCol), lambda), 6))
    resampleByWeight(scored, idCol, "dsir_logw", n)
  }
}

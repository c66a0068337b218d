package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.binning.{Binning, UniformAxis}

/** Distribution-drift monitoring between two corpus snapshots — the
  * standard gate for "did this week's crawl/shard shift under the
  * quality model" at 100 TB, where eyeballing histograms per source is
  * impossible.
  */
object Drift {

  /** Population Stability Index report between an `expected` (baseline)
    * and `actual` (candidate) frame over uniform bins of `ax`:
    * `PSI = Σ_bins (pa − pb) · ln(pa / pb)` with Laplace-0.5 smoothing
    * (`p = (cnt + 0.5) / (n + 0.5 · nBins)`) so one-sided empty bins
    * stay finite. Classic reading: < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 shifted.
    *
    * Output: one row per bin occupied on EITHER side (`bin`, `cnt_a`,
    * `cnt_b`, `psi_bin`) plus the total `psi` on every row. Bins empty
    * on both sides are excluded by construction (histograms are
    * sparse); their smoothed self-contribution would be zero only when
    * `na = nb`, so PSI here is defined over the occupied-bin union —
    * deterministic and mirrorable.
    *
    * Plan shape: each side is ONE partial-agg histogram (shuffle
    * bounded by bins × partitions, the binning engine's contract); the
    * full-outer bin join and the keyless total window touch ≤ `nBins`
    * rows. Out-of-range values drop per histogram semantics.
    */
  def psiReport(
      expected: DataFrame,
      actual: DataFrame,
      ax: UniformAxis,
  ): DataFrame = {
    val bin = Binning.idxName(ax)
    val ha = Binning.histogram(expected, Seq(ax))
      .withColumnRenamed("cnt", "cnt_a")
    val hb = Binning.histogram(actual, Seq(ax))
      .withColumnRenamed("cnt", "cnt_b")
    val joined = ha.join(hb, Seq(bin), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val w = Window.partitionBy()
    val halfK = lit(0.5 * ax.nBins)
    val pa = (col("cnt_a") + 0.5) / (sum(col("cnt_a")).over(w) + halfK)
    val pb = (col("cnt_b") + 0.5) / (sum(col("cnt_b")).over(w) + halfK)
    val contrib = (pa - pb) * log(pa / pb)
    joined
      .withColumn("_c", contrib)
      .select(col(bin).as("bin"), col("cnt_a"), col("cnt_b"),
        round(col("_c"), 6).as("psi_bin"),
        round(sum(col("_c")).over(w), 6).as("psi"))
  }

  /** Per-group KL divergence of the hashed unigram+bigram feature
    * distribution ([[Dsir.featureBuckets]]) from the corpus-wide
    * distribution — the text-side mixture-skew monitor complementing
    * the numeric [[psiReport]]: which sources' language diverges most
    * from the blend the model actually trains on. The MLE estimate
    * `Σ_b p_gb · ln(p_gb / q_b)` runs over the group's OBSERVED
    * buckets, so it is finite without smoothing (every group bucket is
    * also a corpus bucket) and exactly mirrorable in SQL.
    *
    * Output: one row per group — `(groupCol, n_feats, kl_nats)`.
    *
    * Plan shape at scale: the corpus is scanned once and shuffled once
    * into (group, bucket) partial-agg space (≤ groups × numBuckets
    * rows); the per-group totals, global bucket counts, and grand
    * total are windows/aggs over that bounded grouped result — never a
    * second corpus pass.
    */
  def domainDivergence(
      df: DataFrame,
      textCol: String,
      groupCol: String,
      numBuckets: Int = 1 << 13,
  ): DataFrame = {
    val counts = df
      .select(col(groupCol),
        explode(Dsir.featureBuckets(col(textCol), numBuckets)).as("bucket"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val enriched = counts
      .withColumn("_tg", sum("c").over(Window.partitionBy(groupCol)))
      .withColumn("_cb", sum("c").over(Window.partitionBy("bucket")))
      .withColumn("_n", sum("c").over(Window.partitionBy()))
    val p = col("c").cast("double") / col("_tg").cast("double")
    val q = col("_cb").cast("double") / col("_n").cast("double")
    enriched
      .groupBy(col(groupCol))
      .agg(max(col("_tg")).as("n_feats"),
        round(sum(p * log(p / q)), 6).as("kl_nats"))
  }
}

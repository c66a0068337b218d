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
}

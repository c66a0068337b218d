package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.binning.{BinAxis, Binning, UniformAxis}

/** Diagnostics + calibration-support aggregations (SURVEY.md §2.5
  * A10/A11/A13).
  */
object Diagnostics {

  /** A10 `pre_binning` (`sed/core/processor.py:2076-2123`): coarse
    * histogram over the first `nFiles` input files only — file pruning via
    * `input_file_name`, so the scan itself is limited, not post-filtered.
    */
  def preBinning(df: DataFrame, axes: Seq[BinAxis], nFiles: Int = 100): DataFrame = {
    val files = df.select(input_file_name()).distinct()
      .limit(nFiles).collect().map(_.getString(0))
    Binning.histogram(df.filter(input_file_name().isin(files.toIndexedSeq: _*)), axes)
  }

  /** A11 `EnergyCalibrator.bin_data` (`sed/calibrator/energy.py:178-270`):
    * per-category (per-file / per-bias) 1-D TOF histograms, pivoted into a
    * driver-side traces matrix `[categories × bins]` for the calibration
    * fits.
    */
  def binData(
      df: DataFrame,
      categoryCol: Column,
      ax: UniformAxis,
  ): (Array[String], Array[Array[Double]]) = {
    val rows = Binning
      .histogramPer(df, categoryCol.cast("string"), "cat", Seq(ax))
      .collect()
    val cats = rows.map(_.getString(0)).distinct.sorted
    val catIdx = cats.zipWithIndex.toMap
    val traces = Array.ofDim[Double](cats.length, ax.nBins)
    rows.foreach { r =>
      traces(catIdx(r.getString(0)))(r.getLong(1).toInt) = r.getLong(2).toDouble
    }
    (cats, traces)
  }

  /** A13 `view_event_histogram` (`sed/core/processor.py:2368-2457`): 1-D
    * histograms of several columns over a bounded sample of the input (the
    * reference reads one dask partition; here `limit` bounds the scan).
    * Returns per-column (centers, counts) for plotting.
    */
  def viewEventHistogram(
      df: DataFrame,
      axes: Seq[UniformAxis],
      sampleRows: Int = 100000,
  ): Map[String, (Array[Double], Array[Long])] = {
    val sample = df.limit(sampleRows).cache()
    try axes.map { ax =>
      val counts = new Array[Long](ax.nBins)
      Binning.histogram(sample, Seq(ax)).collect()
        .foreach(r => counts(r.getLong(0).toInt) = r.getLong(1))
      ax.column -> ((ax.centers, counts))
    }.toMap
    finally sample.unpersist()
  }
}

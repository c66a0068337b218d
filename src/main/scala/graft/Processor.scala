package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.binning._
import graft.calibrate.{Delay, Energy, Momentum}
import graft.dfops.DfOps

/** Workflow metadata tree with the reference's duplicate policies
  * (`sed/core/metadata.py:56-109`): raise / overwrite / merge.
  */
final class MetadataTree {
  private var tree: Map[String, Any] = Map.empty

  def add(entry: Map[String, Any], name: String, policy: String = "raise"): Unit = {
    if (tree.contains(name)) policy match {
      case "raise" =>
        throw new IllegalArgumentException(
          s"Key '$name' already exists; use policy overwrite/merge")
      case "overwrite" => tree += name -> entry
      case "merge" =>
        val prev = tree(name).asInstanceOf[Map[String, Any]]
        tree += name -> (prev ++ entry)
      case other => throw new IllegalArgumentException(s"Unknown policy $other")
    }
    else tree += name -> entry
  }

  def get: Map[String, Any] = tree
}

/** The orchestrating processor — the Spark re-expression of
  * `SedProcessor` (`sed/core/processor.py`): holds the event dataframe,
  * the optional timed companion, calibration parameter state, and the
  * metadata provenance tree; every transform mirrors onto the timed table
  * when its columns exist (`processor.py:1453-1474`).
  *
  * All transforms stay lazy `withColumn` chains; actions happen only in
  * [[compute]] / diagnostics, exactly like the reference's dask graphs.
  */
class Processor(
    val spark: SparkSession,
    private var df: DataFrame,
    private var timedDf: Option[DataFrame] = None,
) {
  val metadata = new MetadataTree

  def dataframe: DataFrame = df
  def timed: Option[DataFrame] = timedDf

  private def onBoth(cols: Seq[String])(f: DataFrame => DataFrame): Unit = {
    df = f(df)
    timedDf = timedDf.map { t =>
      if (cols.forall(t.columns.contains)) f(t) else t
    }
  }

  /** P2 `filter_column`: validated open-interval filter on both tables. */
  def filterColumn(column: String, lower: Double, upper: Double): this.type = {
    require(df.columns.contains(column), s"Column $column not in dataframe")
    onBoth(Seq(column))(DfOps.applyFilter(_, column, lower, upper))
    metadata.add(Map("column" -> column, "lower" -> lower, "upper" -> upper),
      s"filter_$column", "overwrite")
    this
  }

  /** T1 `add_jitter` on the configured axes (in place, as the reference's
    * default workflow does).
    */
  def addJitter(cols: Seq[String], amps: Seq[Double] = Seq(0.5), seed: Long = 42L): this.type = {
    onBoth(cols)(DfOps.applyJitter(_, cols, Some(cols), amps, "uniform", seed))
    metadata.add(Map("cols" -> cols, "amps" -> amps), "jitter", "overwrite")
    this
  }

  /** T8 `apply_momentum_correction` via a broadcast inverse field. */
  def applyMomentumCorrection(
      invDfield: Array[Array[Array[Double]]],
      detectorRanges: ((Double, Double), (Double, Double)),
      xColumn: String = "X", yColumn: String = "Y",
      newX: String = "Xm", newY: String = "Ym",
  ): this.type = {
    onBoth(Seq(xColumn, yColumn))(
      Momentum.applyDfield(spark, _, invDfield, xColumn, yColumn, newX, newY, detectorRanges))
    metadata.add(Map("applied" -> true), "momentum_correction", "overwrite")
    this
  }

  /** T9 `apply_momentum_calibration`. */
  def applyMomentumCalibration(
      xColumn: String, yColumn: String,
      rStart: Double, cStart: Double, rCenter: Double, cCenter: Double,
      rConversion: Double, cConversion: Double, rStep: Double, cStep: Double,
  ): this.type = {
    onBoth(Seq(xColumn, yColumn))(
      Momentum.appendKAxis(_, xColumn, yColumn, "kx", "ky",
        rStart, cStart, rCenter, cCenter, rConversion, cConversion, rStep, cStep))
    metadata.add(Map("applied" -> true), "momentum_calibration", "overwrite")
    this
  }

  /** T5 `apply_energy_correction`. */
  def applyEnergyCorrection(
      correction: (Column, Column) => Column,
      tofColumn: String = "t", xColumn: String = "X", yColumn: String = "Y",
      correctedTofColumn: String = "tm",
  ): this.type = {
    onBoth(Seq(tofColumn, xColumn, yColumn))(
      Energy.applyEnergyCorrection(_, tofColumn, correctedTofColumn, correction, xColumn, yColumn))
    metadata.add(Map("applied" -> true), "energy_correction", "overwrite")
    this
  }

  /** T2/T3 `append_energy_axis` (fit or poly form). */
  def appendEnergyAxis(
      tofColumn: String,
      calibration: Either[(Double, Double, Double), Seq[Double]],
      binwidth: Double, binning: Int,
      energyScale: String = "kinetic", energyOffset: Double = 0.0,
      energyColumn: String = "energy",
  ): this.type = {
    val expr = calibration match {
      case Left((d, t0, e0)) =>
        Energy.tof2ev(col(tofColumn), d, t0, binwidth, binning, energyScale, e0)
      case Right(polyA) =>
        Energy.tof2evpoly(col(tofColumn), polyA, energyOffset)
    }
    onBoth(Seq(tofColumn))(_.withColumn(energyColumn, expr))
    metadata.add(Map("scale" -> energyScale), "energy_calibration", "overwrite")
    this
  }

  /** T10 `calibrate_delay_axis`. */
  def calibrateDelayAxis(
      adcColumn: String,
      adcRange: (Double, Double),
      delayRange: Option[(Double, Double)] = None,
      delayRangeMm: Option[(Double, Double)] = None,
      time0Mm: Double = 0.0,
  ): this.type = {
    onBoth(Seq(adcColumn))(
      Delay.appendDelayAxis(_, adcColumn, "delay", adcRange, delayRange, delayRangeMm, time0Mm))
    metadata.add(Map("applied" -> true), "delay_calibration", "overwrite")
    this
  }

  /** T11-T13 `add_offsets`. */
  def addOffsets(
      targetColumn: String,
      offsetColumns: Seq[String],
      weights: Seq[Double],
      preserveMean: Seq[Boolean] = Nil,
      reductions: Seq[Option[String]] = Nil,
  ): this.type = {
    onBoth(targetColumn +: offsetColumns)(
      DfOps.offsetByOtherColumns(_, targetColumn, offsetColumns, weights, preserveMean, reductions))
    metadata.add(Map("target" -> targetColumn), s"offsets_$targetColumn", "overwrite")
    this
  }

  /** A8 `compute`: transient filters → optional binning-time jitter →
    * sparse histogram → dense cube, with optional normalization by the
    * timed-table histogram (A7). `jitter` lists quantized columns to
    * de-quantize in place with ±0.5 uniform noise before binning
    * (`bin_dataframe(jitter=…)`, `sed/binning/binning.py:511-537`).
    */
  def compute(
      axes: Seq[BinAxis],
      filters: Seq[(String, Double, Double)] = Nil,
      jitter: Seq[String] = Nil,
      normalizeToAcquisitionTime: Option[String] = None,
      timeUnit: Double = 0.001,
      dfPartitions: Option[Int] = None,
  ): BinnedCube = {
    // P7 partition selection (`processor.py:2210-2216`): bin only the
    // first N input files — pruned at the scan via input_file_name
    val limited = dfPartitions match {
      case None => df
      case Some(n) =>
        val files = df.select(input_file_name()).distinct()
          .limit(n).collect().map(_.getString(0))
        df.filter(input_file_name().isin(files.toIndexedSeq: _*))
    }
    val filtered = filters.foldLeft(limited) { case (d, (c, lo, up)) =>
      require(d.columns.contains(c), s"Filter column $c not in dataframe")
      DfOps.applyFilter(d, c, lo, up)
    }
    val jittered =
      if (jitter.isEmpty) filtered
      else DfOps.applyJitter(filtered, jitter, colsJittered = Some(jitter))
    val cube = Binning.histogramCube(jittered, axes)
      .withAttrs("units" -> "counts", "long_name" -> "photoelectron counts")
    normalizeToAcquisitionTime match {
      case None => cube
      case Some(axisName) =>
        val ax = axes.find(_.column == axisName)
          .getOrElse(throw new IllegalArgumentException(
            s"Normalization axis $axisName not among bin axes"))
        val norm = getNormalizationHistogram(ax, timeUnit)
        val normalized = cube.normalizeBy(axisName, norm)
        BinnedCube(cube.axisNames, cube.axes,
          normalized.map(v => math.round(v)), cube.shape,
          cube.attrs + ("normalized" -> "per_second")) // integer view
    }
  }

  /** A9 `get_normalization_histogram` from the timed table (A7), as a
    * dense per-bin array aligned with the axis.
    */
  def getNormalizationHistogram(ax: BinAxis, timeUnit: Double = 0.001): Array[Double] = {
    val t = timedDf.getOrElse(
      throw new IllegalStateException("No timed dataframe available"))
    val rows = Binning
      .normalizationHistogramFromTimedDataframe(t, ax, timeUnit)
      .collect()
    val out = new Array[Double](ax.nBins)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getDouble(1))
    out
  }
}

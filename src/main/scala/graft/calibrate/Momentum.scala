package graft.calibrate

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Momentum calibration — per-event application paths of
  * `sed/calibrator/momentum.py` (T8 distortion correction, T9 k-axis).
  */
object Momentum {

  /** T9 `detector_coordinates_2_k_coordinates`
    * (`sed/calibrator/momentum.py:1997-2032`): linear detector→momentum,
    * `k = conversion · ((r − (r_start + r_step·r_center)) / r_step)` per
    * axis.
    */
  def detectorToK(
      det: Column,
      start: Double,
      center: Double,
      conversion: Double,
      step: Double,
  ): Column = {
    val det0 = start + step * center
    lit(conversion) * ((det - lit(det0)) / lit(step))
  }

  /** `append_k_axis` (`sed/calibrator/momentum.py:1836-1916`): both axes in
    * one projection.
    */
  def appendKAxis(
      df: DataFrame,
      xColumn: String,
      yColumn: String,
      kxColumn: String,
      kyColumn: String,
      rStart: Double, cStart: Double,
      rCenter: Double, cCenter: Double,
      rConversion: Double, cConversion: Double,
      rStep: Double, cStep: Double,
  ): DataFrame =
    df.withColumns(Map(
      kxColumn -> detectorToK(col(xColumn), rStart, rCenter, rConversion, rStep),
      kyColumn -> detectorToK(col(yColumn), cStart, cCenter, cConversion, cStep),
    ))

  /** T8 `apply_dfield` (`sed/calibrator/momentum.py:2035-2071`): per-event
    * bilinear interpolation into the inverse deformation field —
    * `(Xm, Ym) = bilinear(invDfield[0|1], X/detRatioX, Y/detRatioY)`.
    *
    * The field (two `rows × cols` grids, ≈2048² doubles each) is broadcast
    * once; the lookup is a Scala UDF over the broadcast handle (v0 — a
    * codegen `Expression` is the planned upgrade, SURVEY.md §4). Matches
    * `scipy.ndimage.map_coordinates(order=1)` with nearest-edge clamping.
    */
  def applyDfield(
      spark: SparkSession,
      df: DataFrame,
      invDfield: Array[Array[Array[Double]]], // [2][rows][cols]
      xColumn: String,
      yColumn: String,
      newXColumn: String,
      newYColumn: String,
      detectorRanges: ((Double, Double), (Double, Double)),
  ): DataFrame = {
    require(invDfield.length == 2)
    val rows = invDfield(0).length
    val cols = invDfield(0)(0).length
    // map detector coordinates onto grid indices (momentum.py:2054-2060)
    val xScale = (rows - 1).toDouble / (detectorRanges._1._2 - detectorRanges._1._1)
    val yScale = (cols - 1).toDouble / (detectorRanges._2._2 - detectorRanges._2._1)
    val xOff = detectorRanges._1._1
    val yOff = detectorRanges._2._1
    val bc: Broadcast[Array[Array[Array[Double]]]] =
      spark.sparkContext.broadcast(invDfield)

    def bilinear(field: Int) = udf { (x: Double, y: Double) =>
      val g = bc.value(field)
      val r = (x - xOff) * xScale
      val c = (y - yOff) * yScale
      // clamp to the grid (map_coordinates mode="nearest" at order=1)
      val rc = math.min(math.max(r, 0.0), rows - 1.0)
      val cc = math.min(math.max(c, 0.0), cols - 1.0)
      val r0 = math.min(rc.toInt, rows - 2)
      val c0 = math.min(cc.toInt, cols - 2)
      val fr = rc - r0
      val fc = cc - c0
      g(r0)(c0) * (1 - fr) * (1 - fc) +
        g(r0 + 1)(c0) * fr * (1 - fc) +
        g(r0)(c0 + 1) * (1 - fr) * fc +
        g(r0 + 1)(c0 + 1) * fr * fc
    }

    df.withColumns(Map(
      newXColumn -> bilinear(0)(col(xColumn), col(yColumn)),
      newYColumn -> bilinear(1)(col(xColumn), col(yColumn)),
    ))
  }
}

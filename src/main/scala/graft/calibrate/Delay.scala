package graft.calibrate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delay calibration — `sed/calibrator/delay.py` (T10, T12). */
object Delay {

  /** `mm_to_ps` (`sed/calibrator/delay.py:406-421`): double-pass delay-stage
    * position → relative delay, `Δt = (mm − t0) / 0.15`.
    */
  def mmToPs(delayMm: Double, time0Mm: Double): Double = (delayMm - time0Mm) / 0.15

  /** T10 `append_delay_axis` (`sed/calibrator/delay.py:52-205`): linear
    * ADC→ps, `delay = d0 + (adc − a0)·(d1 − d0)/(a1 − a0)`.
    */
  def adcToDelay(
      adc: Column,
      adcRange: (Double, Double),
      delayRange: (Double, Double),
  ): Column =
    lit(delayRange._1) + (adc - lit(adcRange._1)) *
      lit(delayRange._2 - delayRange._1) / lit(adcRange._2 - adcRange._1)

  /** Convenience: delay range given in stage millimetres + t0
    * (`delay.py:178-190`).
    */
  def appendDelayAxis(
      df: DataFrame,
      adcColumn: String,
      delayColumn: String,
      adcRange: (Double, Double),
      delayRange: Option[(Double, Double)] = None,
      delayRangeMm: Option[(Double, Double)] = None,
      time0Mm: Double = 0.0,
      flipDelayAxis: Boolean = false,
  ): DataFrame = {
    val dr = delayRange.orElse(
      delayRangeMm.map(r => (mmToPs(r._1, time0Mm), mmToPs(r._2, time0Mm)))
    ).getOrElse(throw new IllegalArgumentException(
      "Not enough parameters for delay calibration."))
    val d = adcToDelay(col(adcColumn), adcRange, dr)
    df.withColumn(delayColumn, if (flipDelayAxis) -d else d)
  }
}

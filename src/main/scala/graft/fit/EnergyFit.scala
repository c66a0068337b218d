package graft.fit

import graft.calibrate.Energy

/** Energy-calibration estimation (SURVEY.md §2.7 D5/D6/D12): fit the
  * TOF→energy model to (peak position, bias voltage) pairs extracted from
  * per-file EDC traces (`sed/calibrator/energy.py:2090-2335,515-607`).
  */
object EnergyFit {

  /** Calibration result mirroring the reference's calibration dict. */
  case class FitResult(
      tofDistance: Double,
      timeOffset: Double,
      energyOffset: Double,
      energyScale: String,
  )

  /** D5 `fit_energy_calibration`: nonlinear least squares of
    * `E = 2.84281e-12·sign·(d/(t·binwidth·2^binning − t0))² + E0` over
    * (peak TOF, reference energy) pairs, via Levenberg-Marquardt on
    * (d, t0, E0).
    */
  def fitEnergyCalibration(
      peakPositions: Array[Double],
      referenceEnergies: Array[Double],
      binwidth: Double,
      binning: Int,
      energyScale: String = "kinetic",
      initial: (Double, Double, Double) = (1.0, 1e6, 0.0),
  ): FitResult = {
    require(peakPositions.length == referenceEnergies.length)
    val sign = if (energyScale == "kinetic") 1.0 else -1.0
    val k = binwidth * math.pow(2.0, binning)
    def model(p: Array[Double])(t: Double): Double = {
      val r = p(0) / (t * k - p(1))
      Energy.TofToEvPrefactor * sign * r * r + p(2)
    }
    def residuals(p: Array[Double]): Array[Double] =
      peakPositions.zip(referenceEnergies).map { case (t, e) => model(p)(t) - e }
    val fitted = Numerics.levenbergMarquardt(
      residuals, Array(initial._1, initial._2, initial._3))
    FitResult(fitted(0), fitted(1), fitted(2), energyScale)
  }

  /** D6 `poly_energy_calibration`: linear LSQ on the differential
    * drift-time matrix — rows `T_i = (t_ref^p − t_i^p)` for `p = 1..order`,
    * targets `b_i = E_i − E_ref`; returns the polynomial coefficients
    * (ascending powers 1..order).
    */
  def polyEnergyCalibration(
      peakPositions: Array[Double],
      referenceEnergies: Array[Double],
      refIdx: Int,
      order: Int = 3,
  ): Array[Double] = {
    val tRef = peakPositions(refIdx)
    val eRef = referenceEnergies(refIdx)
    val rows = peakPositions.indices.filter(_ != refIdx).toArray
    val design = rows.map { i =>
      Array.tabulate(order)(p =>
        math.pow(tRef, (p + 1).toDouble) - math.pow(peakPositions(i), (p + 1).toDouble))
    }
    val b = rows.map(i => referenceEnergies(i) - eRef)
    Numerics.polyFit(design, b)
  }
}

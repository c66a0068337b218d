package graft.calibrate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Energy calibration — per-event application paths of
  * `sed/calibrator/energy.py`. All pure `Column` arithmetic (T2-T6, T11):
  * one `withColumn` each, fused by Catalyst into a single projection.
  *
  * Arithmetic is structured identically to the reference kernels (and to
  * the oracle SQL emitted beside each query): squares are explicit
  * multiplications, associations match, so doubles reproduce bit-for-bit.
  */
object Energy {

  /** Electron rest mass / 2 in the reference's unit soup
    * (`sed/calibrator/energy.py:2368`).
    */
  val TofToEvPrefactor = 2.84281e-12

  /** T2 `tof2ev` (`sed/calibrator/energy.py:2338-2374`):
    * `E = 2.84281e-12 · sign · (d / (t·binwidth·2^binning − t0))² + E0`.
    *
    * @param tofDistance  drift distance d in m
    * @param timeOffset   t0 in ns
    * @param binwidth     TOF bin width in ns
    * @param binning      TOF binning exponent (factor 2^binning)
    * @param energyScale  "kinetic" (sign +1) or "binding" (sign −1)
    * @param energyOffset E0 in eV
    */
  def tof2ev(
      t: Column,
      tofDistance: Double,
      timeOffset: Double,
      binwidth: Double,
      binning: Int,
      energyScale: String = "kinetic",
      energyOffset: Double = 0.0,
  ): Column = {
    val sign = if (energyScale == "kinetic") 1.0 else -1.0
    val r = lit(tofDistance) / (t * lit(binwidth) * lit(math.pow(2.0, binning)) - lit(timeOffset))
    lit(TofToEvPrefactor * sign) * (r * r) + lit(energyOffset)
  }

  /** T3 `tof2evpoly` (`sed/calibrator/energy.py:2377-2401`):
    * `E = Σᵢ aᵢ·tⁱ + E0` with `polyA` ordered highest-degree first (the
    * reference reverses and sums ascending powers — we accumulate in the
    * same order so the FP result is identical).
    */
  def tof2evpoly(t: Column, polyA: Seq[Double], energyOffset: Double): Column = {
    require(polyA.nonEmpty, "tof2evpoly needs at least one coefficient")
    val asc = polyA.reverse // a(i) multiplies t^(i+1)
    var power: Column = t
    var energy: Column = lit(asc.head) * power
    for (a <- asc.tail) {
      power = power * t
      energy = energy + lit(a) * power
    }
    energy + lit(energyOffset)
  }

  /** T4 `tof2ns` (`sed/calibrator/energy.py:2404-2421`):
    * `t_ns = t · 1e9 · binwidth · 2^binning` (binwidth here in seconds).
    */
  def tof2ns(t: Column, binwidth: Double, binning: Int): Column =
    t * lit(1e9) * lit(binwidth) * lit(math.pow(2.0, binning))

  /** T5 `apply_energy_correction` profile functions
    * (`correction_function`, `sed/calibrator/energy.py:1670-1782`):
    * X/Y-dependent TOF shift `tm = t + f(x, y)`.
    */
  object Correction {

    def spherical(x: Column, y: Column, cx: Double, cy: Double, amplitude: Double, diameter: Double): Column = {
      val dx = x - lit(cx)
      val dy = y - lit(cy)
      -((lit(1.0) - sqrt(lit(1.0) - (dx * dx + dy * dy) / lit(diameter * diameter))) * lit(100.0) * lit(amplitude))
    }

    def lorentzian(x: Column, y: Column, cx: Double, cy: Double, amplitude: Double, gamma: Double): Column = {
      val dx = x - lit(cx)
      val dy = y - lit(cy)
      lit(100000.0 * amplitude / (gamma * math.Pi)) *
        (lit(gamma * gamma) / (dx * dx + dy * dy + lit(gamma * gamma)) - lit(1.0))
    }

    def gaussian(x: Column, y: Column, cx: Double, cy: Double, amplitude: Double, sigma: Double): Column = {
      val dx = x - lit(cx)
      val dy = y - lit(cy)
      lit(20000.0 * amplitude / math.sqrt(2.0 * math.Pi * sigma * sigma)) *
        (exp(-(dx * dx + dy * dy) / lit(2.0 * sigma * sigma)) - lit(1.0))
    }

    /** Asymmetric 2-D Lorentz: independent profiles along x and y. */
    def lorentzianAsymmetric(
        x: Column, y: Column, cx: Double, cy: Double,
        amplitude: Double, gamma: Double,
        amplitude2: Double, gamma2: Double,
    ): Column = {
      val dx = x - lit(cx)
      val dy = y - lit(cy)
      lit(100000.0 * amplitude / (gamma * math.Pi)) *
        (lit(gamma * gamma) / (dy * dy + lit(gamma * gamma)) - lit(1.0)) +
        lit(100000.0 * amplitude2 / (gamma2 * math.Pi)) *
          (lit(gamma2 * gamma2) / (dx * dx + lit(gamma2 * gamma2)) - lit(1.0))
    }
  }

  /** Apply a correction profile: `tm = t + f(x, y)`
    * (`sed/calibrator/energy.py:1313-1408`).
    */
  def applyEnergyCorrection(
      df: DataFrame,
      tofColumn: String,
      correctedTofColumn: String,
      correction: (Column, Column) => Column,
      xColumn: String = "X",
      yColumn: String = "Y",
  ): DataFrame =
    df.withColumn(
      correctedTofColumn,
      col(tofColumn) + correction(col(xColumn), col(yColumn)),
    )

  /** T11 `add_offsets` (`sed/calibrator/energy.py:1476-1646`): shift the
    * energy column by a constant and/or weighted other columns. On the
    * *binding* energy scale every weight's sign flips (higher kinetic
    * energy = lower binding energy); `preserveMean`/`reductions` follow
    * `offset_by_other_columns` (T13).
    */
  def addOffsets(
      df: DataFrame,
      energyColumn: String,
      energyScale: String,
      constant: Double = 0.0,
      offsetColumns: Seq[String] = Nil,
      weights: Seq[Double] = Nil,
      preserveMean: Seq[Boolean] = Nil,
      reductions: Seq[Option[String]] = Nil,
  ): DataFrame = {
    val sign = if (energyScale == "binding") -1.0 else 1.0
    val shifted =
      if (offsetColumns.isEmpty) df
      else graft.dfops.DfOps.offsetByOtherColumns(
        df, energyColumn, offsetColumns, weights.map(_ * sign),
        preserveMean, reductions)
    if (constant == 0.0) shifted
    else shifted.withColumn(energyColumn,
      col(energyColumn) + lit(sign * constant))
  }

  /** T6 `align_dld_sectors` (`sed/calibrator/energy.py:1428-1474`): subtract
    * the per-sector delay `t ← t − delays[sectorID]` for the 8-sector
    * detector. Tiny literal array → `element_at`, no join. The reference
    * downcasts to float32; we keep double (documented divergence).
    */
  def alignDldSectors(
      df: DataFrame,
      tofColumn: String,
      sectorIdColumn: String,
      sectorDelays: Array[Double],
  ): DataFrame =
    df.withColumn(
      tofColumn,
      col(tofColumn) - element_at(
        lit(sectorDelays),
        col(sectorIdColumn).cast("int") + 1,
      ),
    )
}

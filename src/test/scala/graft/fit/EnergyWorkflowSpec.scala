package graft.fit

import org.scalatest.funsuite.AnyFunSuite

import graft.calibrate.Energy

/** Tier-2 integration: the complete energy-calibration estimation
  * workflow the reference tests on its checked-in EDC fixtures
  * (`tests/calibrator/test_energy.py:100-228`) — smoothed/normalized bias
  * traces → DTW range transfer from the reference trace → peak search per
  * trace → nonlinear fit → calibrated axis quality + monotonicity. Traces
  * here are synthesized from a known tof2ev law instead of the CSV
  * fixtures (same shapes: 11 biases × 1000 TOF samples).
  */
class EnergyWorkflowSpec extends AnyFunSuite {

  private val binwidth = 2.0e-10
  private val (dTrue, t0True, e0True) = (1.0, 2.0e-7, 0.7)
  private val nSamples = 1000
  private val tofAxis = Array.tabulate(nSamples)(i => 5000.0 + 5.0 * i)

  /** Reference energy per bias trace, and its peak TOF from the inverse
    * of `E = pref·(d/(t·w − t0))² + E0`.
    */
  private val refEnergies = Array.tabulate(11)(i => 1.8 + 0.2 * i)
  private val peakTofs = refEnergies.map { e =>
    val r = math.sqrt((e - e0True) / Energy.TofToEvPrefactor)
    (dTrue / r + t0True) / binwidth
  }

  /** Gaussian bump at the trace's peak TOF + smooth background. */
  private val traces: Array[Array[Double]] = peakTofs.map { tp =>
    tofAxis.map { t =>
      val z = (t - tp) / 60.0
      math.exp(-0.5 * z * z) * (80.0 + tp / 1000.0) + 3.0 * math.sin(t / 700.0) + 5.0
    }
  }

  test("traces → normspec → DTW ranges → peaks → fit → monotonic axis") {
    // 1. smooth + max-normalize (D1)
    val normed = Numerics.normspec(traces, window = 7, order = 1)
    assert(normed.forall(tr => math.abs(tr.max - 1.0) < 1e-12))

    // 2. reference range around trace 0's peak, transferred per trace by
    //    DTW alignment (D2/D3)
    val refPeakIdx = normed(0).indexOf(normed(0).max)
    val refRange = (refPeakIdx - 40, refPeakIdx + 40)
    val peaks = normed.zipWithIndex.map { case (tr, i) =>
      val (lo, hi) =
        if (i == 0) refRange
        else Numerics.rangeConvert(refRange, Numerics.dtwPath(normed(0), tr))
      // 3. peak search inside the transferred window (D4)
      val window = tr.slice(math.max(lo, 0), math.min(hi, nSamples))
      val (maxima, _) = Numerics.peakdetect1d(window, lookahead = 10, delta = 0.01)
      val idx = maxima.maxBy(_._2)._1 + math.max(lo, 0)
      tofAxis(idx)
    }
    // every detected peak should sit close to the true peak TOF (within
    // the 5-step sample pitch plus smoothing bias)
    peaks.zip(peakTofs).foreach { case (got, want) =>
      assert(math.abs(got - want) < 15.0, s"peak $got vs $want")
    }

    // 4. nonlinear calibration fit (D5/D12)
    val fit = EnergyFit.fitEnergyCalibration(
      peaks, refEnergies, binwidth, 0, initial = (0.8, 0.0, 0.0))

    // calibration quality: the fitted model reproduces the reference
    // energies at the detected peaks (the reference's assert_allclose)
    peaks.zip(refEnergies).foreach { case (t, e) =>
      val r = fit.tofDistance / (t * binwidth - fit.timeOffset)
      val pred = Energy.TofToEvPrefactor * r * r + fit.energyOffset
      assert(math.abs(pred - e) < 0.02, s"predicted $pred vs $e")
    }

    // 5. applied axis monotonicity (kinetic scale: E decreases with TOF —
    //    `tests/calibrator/test_energy.py:195-228`)
    val axis = tofAxis.map { t =>
      val r = fit.tofDistance / (t * binwidth - fit.timeOffset)
      Energy.TofToEvPrefactor * r * r + fit.energyOffset
    }
    axis.sliding(2).foreach { case Array(a, b) => assert(b < a) }
  }
}

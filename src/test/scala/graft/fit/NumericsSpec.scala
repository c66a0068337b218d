package graft.fit

import org.scalatest.funsuite.AnyFunSuite

class NumericsSpec extends AnyFunSuite {

  test("LinAlg.solve and lstsq recover known systems") {
    val x = LinAlg.solve(Array(Array(2.0, 1.0), Array(1.0, 3.0)), Array(5.0, 10.0))
    assert(math.abs(x(0) - 1.0) < 1e-12 && math.abs(x(1) - 3.0) < 1e-12)
    // overdetermined consistent system
    val a = Array(Array(1.0, 1.0), Array(1.0, 2.0), Array(1.0, 3.0))
    val b = Array(3.0, 5.0, 7.0) // y = 1 + 2x
    val c = LinAlg.lstsq(a, b)
    assert(math.abs(c(0) - 1.0) < 1e-10 && math.abs(c(1) - 2.0) < 1e-10)
  }

  test("savgol reproduces polynomials of degree <= order exactly") {
    val y = Array.tabulate(50)(i => 2.0 + 3.0 * i + 0.5 * i * i)
    val sm = Numerics.savgol(y, 7, 2)
    // interior points: quadratic through a window of a quadratic is exact
    (3 until 47).foreach(i => assert(math.abs(sm(i) - y(i)) < 1e-8))
  }

  test("savgol smooths noise toward the underlying signal") {
    val rnd = new scala.util.Random(1)
    val clean = Array.tabulate(200)(i => math.sin(i / 20.0))
    val noisy = clean.map(_ + 0.2 * rnd.nextGaussian())
    val sm = Numerics.savgol(noisy, 11, 2)
    def rms(a: Array[Double]) =
      math.sqrt(a.zip(clean).map { case (x, c) => (x - c) * (x - c) }.sum / a.length)
    assert(rms(sm) < rms(noisy) * 0.6)
  }

  test("dtw aligns a shifted trace; rangeConvert maps ranges through it") {
    def trace(center: Int) =
      Array.tabulate(200)(i => math.exp(-math.pow((i - center) / 8.0, 2)))
    val a = trace(100)
    val b = trace(120)
    val path = Numerics.dtwPath(a, b)
    assert(path.head === ((0, 0)) && path.last === ((199, 199)))
    val (lo, hi) = Numerics.rangeConvert((90, 110), path)
    // the peak-centered range on A must land peak-centered on B (~±shift)
    assert(math.abs(lo - 110) <= 4 && math.abs(hi - 130) <= 4)
  }

  test("peakdetect1d finds both gaussian peaks with prominence filtering") {
    val y = Array.tabulate(500) { i =>
      math.exp(-math.pow((i - 120) / 15.0, 2)) +
        0.7 * math.exp(-math.pow((i - 350) / 15.0, 2))
    }
    val (maxima, _) = Numerics.peakdetect1d(y, lookahead = 30, delta = 0.1)
    assert(maxima.length === 2)
    assert(math.abs(maxima(0)._1 - 120) <= 1)
    assert(math.abs(maxima(1)._1 - 350) <= 1)
  }

  test("Levenberg-Marquardt recovers tof2ev parameters from clean data") {
    // scales chosen so the model term is O(eV): t·binwidth ∈ [1, 2] µs,
    // r = d / (t·w − t0) ∈ [5.6e5, 1.25e6] → E ∈ [0.9, 4.4] eV
    val (d, t0, e0) = (1.0, 2.0e-7, 0.7)
    val binwidth = 2.0e-10
    val ts = Array.tabulate(11)(i => 5000.0 + 500.0 * i)
    val es = ts.map { t =>
      val r = d / (t * binwidth - t0)
      graft.calibrate.Energy.TofToEvPrefactor * r * r + e0
    }
    val fit = EnergyFit.fitEnergyCalibration(ts, es, binwidth, 0,
      initial = (0.8, 0.0, 0.0))
    // (d, t0, E0) are strongly correlated over a narrow TOF window, so the
    // meaningful assertion is calibration quality: predicted energies must
    // reproduce the references (same criterion the reference tests use)
    val predicted = ts.map { t =>
      val r = fit.tofDistance / (t * binwidth - fit.timeOffset)
      graft.calibrate.Energy.TofToEvPrefactor * r * r + fit.energyOffset
    }
    predicted.zip(es).foreach { case (p, e) =>
      assert(math.abs(p - e) < 1e-6 * math.max(1.0, math.abs(e)))
    }
  }

  test("polyEnergyCalibration recovers polynomial drift coefficients") {
    val coeffs = Array(0.02, -3.0e-7) // E(t) = E_c + 0.02 t - 3e-7 t^2 (differential)
    val ts = Array.tabulate(9)(i => 1000.0 + 100.0 * i)
    // energies consistent with differential model: E_i - E_ref = sum_p a_p (tref^p - t_i^p)... invert sign
    val tRef = ts(4)
    val es = ts.map(t => 5.0 + coeffs(0) * (tRef - t) + coeffs(1) * (tRef * tRef - t * t))
    val a = EnergyFit.polyEnergyCalibration(ts, es, refIdx = 4, order = 2)
    assert(math.abs(a(0) - coeffs(0)) < 1e-10)
    assert(math.abs(a(1) - coeffs(1)) < 1e-12)
  }
}

package graft.fit

import scala.collection.mutable.ArrayBuffer

/** Driver-side 1-D numerics for energy calibration (SURVEY.md §2.7
  * D1-D6): smoothing, alignment, peak detection, and model fits. These
  * consume binned traces (≤ a few thousand points), never event data —
  * exactly like the reference, which drops from dask to NumPy at
  * `compute()` boundaries.
  */
object Numerics {

  // ---- D1: Savitzky-Golay smoothing (`normspec`, energy.py:1785-1823) ----

  /** Closed-form Savitzky-Golay convolution coefficients for a centered
    * window of length `window` (odd) and polynomial order `order`.
    */
  def savgolCoeffs(window: Int, order: Int): Array[Double] = {
    require(window % 2 == 1 && window > order, "odd window > order required")
    val half = window / 2
    val a = Array.tabulate(window, order + 1)((i, j) =>
      math.pow((i - half).toDouble, j.toDouble))
    // projection of the delta at the window center onto the poly basis
    val ata = Array.ofDim[Double](order + 1, order + 1)
    for (i <- 0 to order; j <- 0 to order; k <- 0 until window)
      ata(i)(j) += a(k)(i) * a(k)(j)
    val e = Array.tabulate(order + 1)(i => a.map(_(i)).zipWithIndex.map {
      case (v, k) => if (k == half) v else 0.0
    }.sum)
    val c = LinAlg.solve(ata, e)
    Array.tabulate(window)(k => (0 to order).map(j => c(j) * a(k)(j)).sum)
  }

  /** Apply Savitzky-Golay smoothing (edges: nearest-padding). */
  def savgol(y: Array[Double], window: Int, order: Int): Array[Double] = {
    val c = savgolCoeffs(window, order)
    val half = window / 2
    Array.tabulate(y.length) { i =>
      var s = 0.0
      var k = 0
      while (k < window) {
        val idx = math.min(math.max(i + k - half, 0), y.length - 1)
        s += c(k) * y(idx)
        k += 1
      }
      s
    }
  }

  /** `normspec`: smooth then max-normalize each trace. */
  def normspec(traces: Array[Array[Double]], window: Int = 7, order: Int = 1): Array[Array[Double]] =
    traces.map { tr =>
      val sm = savgol(tr, window, order)
      val mx = sm.max
      if (mx == 0.0) sm else sm.map(_ / mx)
    }

  // ---- D2/D3: trace alignment (`find_correspondence`, `range_convert`) ----

  /** Dynamic-time-warping alignment path between two traces. The reference
    * uses the fastdtw approximation for speed (`energy.py:1826-1846`);
    * trace lengths here are ~1000, so the exact O(nm) DTW is affordable
    * and strictly more accurate (documented divergence).
    */
  def dtwPath(a: Array[Double], b: Array[Double]): Array[(Int, Int)] = {
    val n = a.length
    val m = b.length
    val inf = Double.PositiveInfinity
    val cost = Array.fill(n + 1, m + 1)(inf)
    cost(0)(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        val d = math.abs(a(i - 1) - b(j - 1))
        cost(i)(j) = d + math.min(cost(i - 1)(j), math.min(cost(i)(j - 1), cost(i - 1)(j - 1)))
        j += 1
      }
      i += 1
    }
    // backtrack
    val path = ArrayBuffer.empty[(Int, Int)]
    var (r, c) = (n, m)
    while (r > 0 && c > 0) {
      path += ((r - 1, c - 1))
      val diag = cost(r - 1)(c - 1)
      val up = cost(r - 1)(c)
      val left = cost(r)(c - 1)
      if (diag <= up && diag <= left) { r -= 1; c -= 1 }
      else if (up <= left) r -= 1
      else c -= 1
    }
    path.reverse.toArray
  }

  /** `find_nearest` (`energy.py:1875-1889`): index in `arr` whose value is
    * closest to `value` (first such index).
    */
  def findNearest(value: Int, arr: Array[Int]): Int = {
    var best = 0
    var i = 1
    while (i < arr.length) {
      if (math.abs(arr(i) - value) < math.abs(arr(best) - value)) best = i
      i += 1
    }
    best
  }

  /** `range_convert` (`energy.py:1849-1872`): map a (start, end) index
    * range on trace A through a DTW path onto trace B.
    */
  def rangeConvert(xrng: (Int, Int), path: Array[(Int, Int)]): (Int, Int) = {
    val pathA = path.map(_._1)
    val lo = path(findNearest(xrng._1, pathA))._2
    val hi = path(findNearest(xrng._2, pathA))._2
    (lo, hi)
  }

  // ---- D4: lookahead peak detection (`peakdetect1d`, energy.py:1892-2089) ----

  /** Local maxima/minima with a lookahead window and a minimum prominence
    * `delta` (port of the Bergman peakdetect algorithm the reference
    * embeds). Returns (maxima, minima) as (index, value) pairs.
    */
  def peakdetect1d(
      y: Array[Double],
      lookahead: Int = 200,
      delta: Double = 0.0,
  ): (Array[(Int, Double)], Array[(Int, Double)]) = {
    val maxPeaks = ArrayBuffer.empty[(Int, Double)]
    val minPeaks = ArrayBuffer.empty[(Int, Double)]
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var mnPos = -1
    var mxPos = -1
    var lookForMax = true
    var i = 0
    val n = y.length
    while (i < n - lookahead) {
      val v = y(i)
      if (v > mx) { mx = v; mxPos = i }
      if (v < mn) { mn = v; mnPos = i }
      if (lookForMax) {
        if (v < mx - delta && mx != Double.PositiveInfinity) {
          val ahead = y.slice(i, math.min(i + lookahead, n))
          if (ahead.max < mx) {
            maxPeaks += ((mxPos, mx))
            mn = v; mnPos = i
            lookForMax = false
          }
        }
      } else {
        if (v > mn + delta && mn != Double.NegativeInfinity) {
          val ahead = y.slice(i, math.min(i + lookahead, n))
          if (ahead.min > mn) {
            minPeaks += ((mnPos, mn))
            mx = v; mxPos = i
            lookForMax = true
          }
        }
      }
      i += 1
    }
    (maxPeaks.toArray, minPeaks.toArray)
  }

  // ---- D5: Levenberg-Marquardt (`fit_energy_calibration`, energy.py:2090-2223) ----

  /** Generic Levenberg-Marquardt least squares with numeric Jacobian —
    * small parameter counts (≤ 4 here), forward differences.
    */
  def levenbergMarquardt(
      residuals: Array[Double] => Array[Double],
      p0: Array[Double],
      maxIter: Int = 200,
      tol: Double = 1e-12,
  ): Array[Double] = {
    var p = p0.clone()
    var lambda = 1e-3
    var r = residuals(p)
    var cost = r.map(x => x * x).sum
    var iter = 0
    while (iter < maxIter) {
      val nP = p.length
      val nR = r.length
      val jac = Array.ofDim[Double](nR, nP)
      var j = 0
      while (j < nP) {
        val h = math.max(1e-8, math.abs(p(j)) * 1e-8)
        val pj = p.clone(); pj(j) += h
        val rj = residuals(pj)
        var i = 0
        while (i < nR) { jac(i)(j) = (rj(i) - r(i)) / h; i += 1 }
        j += 1
      }
      // (J^T J + λ diag(J^T J)) δ = J^T r
      val jtj = Array.ofDim[Double](nP, nP)
      val jtr = new Array[Double](nP)
      var i = 0
      while (i < nR) {
        var a = 0
        while (a < nP) {
          jtr(a) += jac(i)(a) * r(i)
          var b = 0
          while (b < nP) { jtj(a)(b) += jac(i)(a) * jac(i)(b); b += 1 }
          a += 1
        }
        i += 1
      }
      // Marquardt damping with a diagonal floor so near-zero-gradient
      // parameters don't make the system singular
      val dmax = (0 until nP).map(a => jtj(a)(a)).max
      val damped = Array.tabulate(nP, nP)((a, b) =>
        if (a == b) jtj(a)(b) * (1 + lambda) + lambda * 1e-12 * (dmax + 1e-300)
        else jtj(a)(b))
      val deltaOpt =
        try Some(LinAlg.solve(damped, jtr))
        catch { case _: IllegalArgumentException => None }
      if (deltaOpt.isEmpty) {
        lambda *= 10
        if (lambda > 1e12) return p
        iter += 1
      } else {
      val delta = deltaOpt.get
      val pNew = Array.tabulate(nP)(k => p(k) - delta(k))
      val rNew = residuals(pNew)
      val costNew = rNew.map(x => x * x).sum
      if (costNew < cost) {
        val improvement = cost - costNew
        p = pNew; r = rNew; cost = costNew
        lambda = math.max(lambda * 0.3, 1e-12)
        if (improvement < tol * (1 + cost)) return p
      } else {
        lambda *= 3
        if (lambda > 1e12) return p
      }
      iter += 1
      }
    }
    p
  }

  // ---- D6: polynomial least squares (`poly_energy_calibration`) ----

  /** Fit `b ≈ Σ_j a_j · T_ij` — plain linear least squares on a provided
    * design matrix (the reference builds a differential drift-time matrix
    * and calls `lstsq`, energy.py:2226-2335).
    */
  def polyFit(design: Array[Array[Double]], b: Array[Double]): Array[Double] =
    LinAlg.lstsq(design, b)
}

package graft.fit

/** Minimal dense linear algebra for the driver-side estimation algorithms
  * (SURVEY.md §2.7). All matrices are row-major `Array[Array[Double]]`;
  * sizes here are tiny (≤ a few hundred), so simple Gaussian elimination
  * with partial pivoting is plenty.
  */
object LinAlg {

  /** Solve `A x = b` in place-safe fashion (copies inputs). */
  def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = a.length
    require(a.forall(_.length == n) && b.length == n, "square system required")
    val m = Array.tabulate(n, n + 1)((i, j) => if (j < n) a(i)(j) else b(i))
    var col = 0
    while (col < n) {
      // partial pivot
      var p = col
      var i = col + 1
      while (i < n) { if (math.abs(m(i)(col)) > math.abs(m(p)(col))) p = i; i += 1 }
      require(math.abs(m(p)(col)) > 1e-14, s"singular system at column $col")
      if (p != col) { val t = m(p); m(p) = m(col); m(col) = t }
      val piv = m(col)(col)
      var j = col
      while (j <= n) { m(col)(j) /= piv; j += 1 }
      i = 0
      while (i < n) {
        if (i != col && m(i)(col) != 0.0) {
          val f = m(i)(col)
          var k = col
          while (k <= n) { m(i)(k) -= f * m(col)(k); k += 1 }
        }
        i += 1
      }
      col += 1
    }
    Array.tabulate(n)(i => m(i)(n))
  }

  /** Least-squares solution of an overdetermined `A x ≈ b` via normal
    * equations (fine at these scales and conditioning).
    */
  def lstsq(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val rows = a.length
    val cols = a(0).length
    val ata = Array.ofDim[Double](cols, cols)
    val atb = new Array[Double](cols)
    var r = 0
    while (r < rows) {
      val row = a(r)
      var i = 0
      while (i < cols) {
        atb(i) += row(i) * b(r)
        var j = 0
        while (j < cols) { ata(i)(j) += row(i) * row(j); j += 1 }
        i += 1
      }
      r += 1
    }
    solve(ata, atb)
  }
}

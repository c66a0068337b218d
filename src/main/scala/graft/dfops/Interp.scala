package graft.dfops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Piecewise-linear interpolation over literal knots — the engine behind
  * T15 `add_time_stamped_data` (`np.interp` parity).
  *
  * The knot arrays are known at plan time, so instead of a UDF over a
  * broadcast array we unroll a balanced binary-search tree of `CASE WHEN`
  * expressions: depth ⌈log₂ n⌉, fully whole-stage-codegen'd. Slopes are
  * precomputed on the driver so each leaf is a fused multiply-add.
  */
object Interp {

  /** `np.interp(x, xs, ys)`: clamp to `ys.head` / `ys.last` outside the
    * range, linear in between. `xs` must be strictly ascending.
    */
  def piecewiseLinear(x: Column, xs: Array[Double], ys: Array[Double]): Column = {
    require(xs.length == ys.length && xs.length >= 2, "need >= 2 knots")
    require(xs.sliding(2).forall(p => p(0) < p(1)), "knots must be ascending")
    val n = xs.length - 1 // number of segments
    val slopes = Array.tabulate(n)(k => (ys(k + 1) - ys(k)) / (xs(k + 1) - xs(k)))
    // balanced search over candidate segments [lo, hi)
    def lerp(k: Int): Column =
      lit(ys(k)) + (x - lit(xs(k))) * lit(slopes(k))
    def search(lo: Int, hi: Int): Column =
      if (hi - lo == 1) lerp(lo)
      else {
        val mid = (lo + hi) / 2
        when(x < lit(xs(mid)), search(lo, mid)).otherwise(search(mid, hi))
      }
    when(x <= lit(xs(0)), lit(ys(0)))
      .when(x >= lit(xs(n)), lit(ys(n)))
      .otherwise(search(0, n))
  }

  /** DuckDB SQL twin of [[piecewiseLinear]] (flat CASE chain — the oracle
    * runs on small data); identical arithmetic structure and constants so
    * results hash-match bit-for-bit.
    */
  def piecewiseLinearSql(xSql: String, xs: Array[Double], ys: Array[Double]): String = {
    val n = xs.length - 1
    val slopes = Array.tabulate(n)(k => (ys(k + 1) - ys(k)) / (xs(k + 1) - xs(k)))
    def d(v: Double): String = {
      val s = java.lang.Double.toString(v)
      if (v < 0) s"($s)" else s
    }
    val segs = (0 until n).map { k =>
      s"WHEN $xSql < ${d(xs(k + 1))} THEN ${d(ys(k))} + ($xSql - ${d(xs(k))}) * ${d(slopes(k))}"
    }
    s"CASE WHEN $xSql <= ${d(xs(0))} THEN ${d(ys(0))} " +
      s"WHEN $xSql >= ${d(xs(n))} THEN ${d(ys(n))} " +
      segs.mkString(" ") + " END"
  }
}

package graft.binning

/** Normalized axis specifications for the N-D histogram engine.
  *
  * Mirrors the argument-normalization semantics of the reference
  * (`sed/binning/utils.py:18-138`, `simplify_binning_arguments`) and the
  * center/edge conventions of `sed/binning/binning.py:136-143,313-317`:
  *
  *  - When an axis is given as `(nBins, lo, hi)`, `lo`/`hi` are interpreted as
  *    limits for the bin *centers*. The histogram kernel receives an edge range
  *    shifted down by half a bin (`binning.py:136-143`), and the output
  *    coordinate axis is `linspace(lo, hi, nBins, endpoint=False)`
  *    (`binning.py:313-317`), i.e. `centers(k) = lo + k * width`.
  *  - When an axis is given as an explicit array, the array holds bin
  *    *centers*; edges are derived as midpoints with extrapolated end edges
  *    (`sed/binning/utils.py:141-177`, `bin_centers_to_bin_edges`).
  *
  * These off-by-half conventions must be reproduced exactly for oracle parity
  * (SURVEY.md §7.4 risk 1).
  */
sealed trait BinAxis extends Serializable {
  /** Physical column name this axis bins over. */
  def column: String
  /** Number of output bins. */
  def nBins: Int
  /** Output coordinate axis: bin centers, length `nBins`. */
  def centers: Array[Double]
}

/** Uniform axis: `nBins` equal-width bins whose centers span `[centerLo, centerHi)`.
  *
  * Kernel semantics (`sed/binning/numba_bin.py:54-69`, `_hist_from_bin_range`):
  * `delta = nBins / (edgeHi - edgeLo)`, `j = round((x - edgeLo) * delta, 11)`,
  * last edge inclusive (`j == nBins` folds to `nBins - 1`), event kept iff
  * `0 <= j <= nBins` on the rounded value.
  */
final case class UniformAxis(
    column: String,
    nBins: Int,
    centerLo: Double,
    centerHi: Double,
) extends BinAxis {
  require(nBins > 0, s"nBins must be positive for axis $column")
  require(centerHi > centerLo, s"empty range for axis $column")

  val width: Double = (centerHi - centerLo) / nBins
  /** Lower edge handed to the kernel: half a bin below the first center. */
  val edgeLo: Double = centerLo - width / 2
  /** Upper edge handed to the kernel. */
  val edgeHi: Double = centerHi - width / 2
  /** `1 / binWidth`, as computed by the kernel (`numba_bin.py:52`). */
  val delta: Double = 1.0 / ((edgeHi - edgeLo) / nBins)

  override def centers: Array[Double] =
    Array.tabulate(nBins)(k => centerLo + k * width)
}

/** Explicit-edge axis: `edges` are ascending bin boundaries (length `nBins+1`).
  *
  * Kernel semantics (`sed/binning/numba_bin.py:74-105`, `binsearch`): value
  * below the first or above the last edge is dropped; a value equal to the
  * last edge lands in the last bin; otherwise bin `k` satisfies
  * `edges(k) <= x < edges(k+1)`.
  */
final case class EdgesAxis(column: String, edges: Array[Double]) extends BinAxis {
  require(edges.length >= 2, s"need at least 2 edges for axis $column")
  require(
    edges.sliding(2).forall(p => p(0) < p(1)),
    s"edges must be strictly ascending for axis $column",
  )
  override def nBins: Int = edges.length - 1
  override def centers: Array[Double] = BinSpec.edgesToCenters(edges)
}

object BinSpec {

  /** Midpoint edge array from a center array, end edges extrapolated
    * (`sed/binning/utils.py:141-162`, `bin_centers_to_bin_edges`).
    */
  def centersToEdges(centers: Array[Double]): Array[Double] = {
    require(centers.length >= 2, "need at least 2 bin centers")
    val n = centers.length
    val edges = new Array[Double](n + 1)
    var i = 1
    while (i < n) { edges(i) = (centers(i - 1) + centers(i)) / 2.0; i += 1 }
    edges(0) = centers(0) - (centers(1) - centers(0)) / 2.0
    edges(n) = centers(n - 1) + (centers(n - 1) - centers(n - 2)) / 2.0
    edges
  }

  /** Center array from an edge array (`sed/binning/utils.py:165-177`). */
  def edgesToCenters(edges: Array[Double]): Array[Double] =
    Array.tabulate(edges.length - 1)(i => (edges(i) + edges(i + 1)) / 2.0)

  /** Normalize the polymorphic user bin specification, mirroring
    * `simplify_binning_arguments` (`sed/binning/utils.py:18-138`).
    *
    * Accepted forms (one per axis unless scalar, which broadcasts):
    *  - `Left(nBins)` with a `(lo, hi)` range → [[UniformAxis]]
    *  - `Right(centers)` → [[EdgesAxis]] via [[centersToEdges]]
    */
  def normalize(
      axes: Seq[String],
      bins: Seq[Either[Int, Array[Double]]],
      ranges: Seq[(Double, Double)],
  ): Seq[BinAxis] = {
    val bs: Seq[Either[Int, Array[Double]]] =
      if (bins.length == 1 && axes.length > 1) Seq.fill(axes.length)(bins.head)
      else bins
    require(
      bs.length == axes.length,
      s"bins (${bs.length}) and axes (${axes.length}) length mismatch",
    )
    axes.zipWithIndex.map { case (ax, i) =>
      bs(i) match {
        case Left(n) =>
          require(
            ranges.length > i,
            s"integer bins for axis $ax require a range",
          )
          UniformAxis(ax, n, ranges(i)._1, ranges(i)._2)
        case Right(centers) =>
          EdgesAxis(ax, centersToEdges(centers))
      }
    }
  }
}

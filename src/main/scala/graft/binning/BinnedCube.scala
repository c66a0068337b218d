package graft.binning

/** Dense N-D binned result: the JVM analog of the reference's
  * `xarray.DataArray` cube (`sed/binning/binning.py:430-437`,
  * `sed/core/processor.py:2250-2258`): a flat row-major tensor plus
  * per-dimension coordinate arrays (bin centers) and string attrs.
  *
  * Counts are exact Long (vs the reference's overflow-tolerant uint32,
  * `numba_bin.py:162-168` — documented divergence). Driver-side only; the
  * distributed product is the sparse DataFrame from [[Binning.histogram]].
  */
final case class BinnedCube(
    axisNames: Seq[String],
    axes: Seq[Array[Double]],
    data: Array[Long],
    shape: Seq[Int],
    attrs: Map[String, String] = Map.empty,
) {
  require(axisNames.length == axes.length && axes.length == shape.length)
  require(data.length == shape.map(_.toLong).product)

  private val strides: Array[Long] = {
    val s = new Array[Long](shape.length)
    var acc = 1L
    var i = shape.length - 1
    while (i >= 0) { s(i) = acc; acc *= shape(i); i -= 1 }
    s
  }

  /** Count at the given multi-index. */
  def apply(idx: Int*): Long = {
    require(idx.length == shape.length)
    var flat = 0L
    var i = 0
    while (i < idx.length) { flat += idx(i) * strides(i); i += 1 }
    data(flat.toInt)
  }

  /** Total event mass in the cube. */
  def total: Long = { var s = 0L; var i = 0; while (i < data.length) { s += data(i); i += 1 }; s }

  /** Element-wise division by a 1-D normalization histogram aligned on the
    * named axis (the `compute(normalize_to_acquisition_time=…)` path,
    * `sed/core/processor.py:2260-2293`), mirroring xarray broadcasting by
    * axis name. Cells whose normalizer is 0 become 0.
    */
  def normalizeBy(axisName: String, norm: Array[Double]): Array[Double] = {
    val d = axisNames.indexOf(axisName)
    require(d >= 0, s"axis $axisName not in $axisNames")
    require(norm.length == shape(d), "normalizer length mismatch")
    val out = new Array[Double](data.length)
    var i = 0
    while (i < data.length) {
      val k = ((i / strides(d)) % shape(d)).toInt
      out(i) = if (norm(k) == 0.0) 0.0 else data(i) / norm(k)
      i += 1
    }
    out
  }

  def withAttrs(kv: (String, String)*): BinnedCube = copy(attrs = attrs ++ kv)

  /** D13 `select_slice` (`sed/calibrator/momentum.py:196-316`): sum the
    * cube over an index range of the named axis, dropping that dimension.
    */
  def selectSlice(axisName: String, from: Int, until: Int): BinnedCube = {
    val d = axisNames.indexOf(axisName)
    require(d >= 0, s"axis $axisName not in $axisNames")
    require(from >= 0 && until <= shape(d) && from < until, "bad slice range")
    val outShape = shape.patch(d, Nil, 1)
    val outData = new Array[Long](outShape.map(_.toLong).product.toInt)
    val outStrides = {
      val s = new Array[Long](outShape.length)
      var acc = 1L
      var i = outShape.length - 1
      while (i >= 0) { s(i) = acc; acc *= outShape(i); i -= 1 }
      s
    }
    var i = 0
    while (i < data.length) {
      val k = ((i / strides(d)) % shape(d)).toInt
      if (k >= from && k < until) {
        var flat = 0L
        var dim = 0
        var o = 0
        while (dim < shape.length) {
          if (dim != d) {
            flat += ((i / strides(dim)) % shape(dim)) * outStrides(o)
            o += 1
          }
          dim += 1
        }
        outData(flat.toInt) += data(i)
      }
      i += 1
    }
    BinnedCube(
      axisNames.patch(d, Nil, 1),
      axes.patch(d, Nil, 1),
      outData,
      outShape,
      attrs,
    )
  }
}

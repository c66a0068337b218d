package graft.binning

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Custom Catalyst aggregate: the dense N-D histogram fast path
  * (SURVEY.md §4 item 1 — exact `numba_histogramdd` semantics with a dense
  * per-partition accumulator instead of a sparse groupBy).
  *
  * Why it exists: `groupBy(idx…).count()` shuffles one row per non-empty
  * cell per partition. For small cubes (1-D/2-D: ≤ ~10⁶ cells) a dense
  * `Array[Long]` buffer turns the whole histogram into ONE partial
  * aggregate per partition plus a single `numCells`-long merge — shuffle
  * bytes collapse from O(cells × partitions) rows to `partitions` flat
  * buffers, exactly the reference's per-partition-cube + tree-combine
  * design (`sed/binning/binning.py:327-407`) recast as a Catalyst
  * `TypedImperativeAggregate`. For big sparse cubes (4-D 100⁴) the dense
  * buffer would be 800 MB/partition — the sparse groupBy path stays the
  * right plan; [[Binning.histogram]] callers choose by cube size.
  */
case class DenseHistogramAgg(
    child: Expression, // flat cell index, LongType, null ⇔ out of range
    numCells: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numCells)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) buffer(v.asInstanceOf[Long].toInt) += 1L
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numCells) { buffer(i) += other(i); i += 1 }
    buffer
  }

  // clone: never alias live mutable buffer state into the output (one
  // copy per query — the aggregate has a single global group)
  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numCells * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numCells)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): DenseHistogramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DenseHistogramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DenseHistogramAgg =
    copy(child = newChild)
}

object DenseHistogramAgg {

  /** Flat row-major cell index over the axes (null if any axis is out of
    * range), plus the total cell count.
    */
  def flatIndex(axes: Seq[BinAxis]): (Column, Int) = {
    val cells = axes.map(_.nBins.toLong).product
    require(cells <= Int.MaxValue, s"dense cube too large: $cells cells")
    val strides = axes.scanRight(1L)((ax, acc) => ax.nBins * acc).tail
    val idx = axes.zip(strides).map { case (ax, s) =>
      Binning.binIndex(ax) * lit(s)
    }.reduce(_ + _)
    (idx, cells.toInt)
  }

  /** Dense histogram of `df` over `axes`, entirely aggregate-side:
    * returns the collected [[BinnedCube]].
    */
  def denseHistogram(df: DataFrame, axes: Seq[BinAxis]): BinnedCube = {
    import org.apache.spark.sql.GraftBridge
    val (idx, cells) = flatIndex(axes)
    val projected = df.select(idx.as("_flat"))
    val agg = DenseHistogramAgg(
      GraftBridge.expression(projected.col("_flat")), cells)
      .toAggregateExpression()
    val data = projected
      .agg(GraftBridge.column(agg).as("hist"))
      .head().getSeq[Long](0).toArray
    BinnedCube(axes.map(_.column), axes.map(_.centers), data, axes.map(_.nBins))
  }
}

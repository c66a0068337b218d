package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass CENTERED co-moment aggregate of a float/double vector
  * column: upper-triangle `Σ (x_i−μ_i)(x_j−μ_j)` (Welford update,
  * Chan parallel merge), the running mean vector, and the row count in
  * a SINGLE flat buffer — everything a covariance matrix needs from
  * ONE scan with no shuffle beyond `partitions` flat buffers
  * (`dim(dim+1)/2 + dim + 1` doubles each; 64-dim ⇒ ~17 KB). The
  * per-row cost is the inherent dim²/2 multiply-adds of covariance.
  *
  * Centered moments matter: the naive `Σxy/n − μ_x·μ_y` form suffers
  * catastrophic cancellation (the two terms agree to many digits when
  * means dominate), so partition-order float noise surfaces directly
  * in the covariance value. The centered sums keep every addend on the
  * order of the result itself, so cross-engine / cross-partitioning
  * agreement holds to ~1e-12 relative instead of ~1e-6 absolute.
  */
case class VectorMomentsAgg(
    child: Expression, // array<float> | array<double>
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private val tri = dim * (dim + 1) / 2
  // layout: [0, tri) = Σ (x_i−μ_i)(x_j−μ_j) (row-major, i ≤ j),
  // [tri, tri+dim) = running mean μ_i, last slot = count
  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](tri + dim + 1)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vector of length ${arr.numElements()} in a dim-$dim aggregation")
      val x = new Array[Double](dim)
      var i = 0
      if (isFloat) while (i < dim) { x(i) = arr.getFloat(i); i += 1 }
      else while (i < dim) { x(i) = arr.getDouble(i); i += 1 }
      val n = buffer(tri + dim) + 1.0
      // Welford: δ against the OLD mean, δ' against the NEW mean;
      // C_ij += δ_i·δ'_j (δ' = δ·(n−1)/n, so the product is symmetric)
      val dOld = new Array[Double](dim)
      val dNew = new Array[Double](dim)
      i = 0
      while (i < dim) {
        val d = x(i) - buffer(tri + i)
        dOld(i) = d
        buffer(tri + i) += d / n
        dNew(i) = x(i) - buffer(tri + i)
        i += 1
      }
      var p = 0
      i = 0
      while (i < dim) {
        val di = dOld(i)
        var j = i
        while (j < dim) { buffer(p) += di * dNew(j); j += 1; p += 1 }
        i += 1
      }
      buffer(tri + dim) = n
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    val nA = buffer(tri + dim)
    val nB = other(tri + dim)
    if (nB == 0.0) return buffer
    if (nA == 0.0) { System.arraycopy(other, 0, buffer, 0, buffer.length); return buffer }
    // Chan et al. pairwise merge: C = C_A + C_B + δδᵀ·n_A·n_B/n
    val n = nA + nB
    val delta = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      delta(i) = other(tri + i) - buffer(tri + i)
      buffer(tri + i) += delta(i) * nB / n
      i += 1
    }
    val w = nA * nB / n
    var p = 0
    i = 0
    while (i < dim) {
      val di = delta(i)
      var j = i
      while (j < dim) { buffer(p) += other(p) + di * delta(j) * w; j += 1; p += 1 }
      i += 1
    }
    buffer(tri + dim) = n
    buffer
  }

  // clone: see VectorSumAgg.eval — never alias live mutable buffer state
  // into the output
  override def eval(buffer: Array[Double]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](tri + dim + 1)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMomentsAgg =
    copy(child = newChild)
}

/** Integer-EXACT raw-moment aggregate of a float/double vector column:
  * each component is quantized to `q = ⌊x · 2^scaleBits⌋` (float32 →
  * double is exact, a power-of-two multiply is exact, floor is exact —
  * so every engine computes the identical long), then the upper-triangle
  * `Σ q_i·q_j`, the sums `Σ q_i`, and the count accumulate in ONE flat
  * long buffer. Integer addition is associative and commutative, so the
  * result is bit-identical under ANY partitioning, row order, or merge
  * tree — the property a cross-engine hash gate needs, which no float
  * aggregate (however well-centered) can guarantee at a rounding
  * boundary. Same one-scan / `partitions × ~17 KB` shuffle shape as
  * [[VectorMomentsAgg]].
  *
  * Overflow headroom: with `|x| ≤ 1` and `scaleBits = 20`,
  * `|q·q| ≤ 2^40`, so `Σ` stays inside int64 up to ~2^23 ≈ 8M rows per
  * final buffer; callers with larger corpora or wider ranges should
  * lower `scaleBits` (the require below is a hard guard, not a wish).
  */
case class LongVectorMomentsAgg(
    child: Expression, // array<float> | array<double>
    dim: Int,
    scaleBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private val tri = dim * (dim + 1) / 2
  private val scale = (1L << scaleBits).toDouble

  // layout: [0, tri) = Σ q_i·q_j (row-major, i ≤ j),
  // [tri, tri+dim) = Σ q_i, last slot = count
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](tri + dim + 1)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vector of length ${arr.numElements()} in a dim-$dim aggregation")
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val f = math.floor(x * scale)
        require(math.abs(f) < (1L << 31).toDouble,
          s"component $x overflows the 2^$scaleBits quantization — lower scaleBits")
        q(i) = f.toLong
        i += 1
      }
      var p = 0
      i = 0
      while (i < dim) {
        val qi = q(i)
        buffer(tri + i) += qi
        var j = i
        while (j < dim) { buffer(p) += qi * q(j); j += 1; p += 1 }
        i += 1
      }
      buffer(tri + dim) += 1L
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var p = 0
    while (p < buffer.length) { buffer(p) += other(p); p += 1 }
    buffer
  }

  // clone: see VectorSumAgg.eval
  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](tri + dim + 1)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVectorMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVectorMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongVectorMomentsAgg =
    copy(child = newChild)
}

/** PCA over an embedding column — the standard preprocessing in front of
  * embedding dedup/ANN (SemDeDup whitens; IVF quantizers train better in
  * a decorrelated basis) and a dimensionality-reduction lever in its own
  * right. Distribution of labor: the dim×dim covariance comes from ONE
  * corpus pass ([[VectorMomentsAgg]]); the eigendecomposition of that
  * tiny symmetric matrix runs driver-side (cyclic Jacobi — dim ≤ a few
  * thousand is microseconds-to-seconds, and no cluster round can beat a
  * dim² local solve); the projection back over the corpus is a map-only
  * expression pass against the literal component matrix.
  */
object Pca {

  /** Population covariance matrix (divide by n, matching `numpy.cov
    * (bias=True)` / DuckDB `covar_pop`) plus the mean vector and count,
    * from one corpus pass. Null vectors are dropped.
    */
  def covariance(df: DataFrame, vecCol: String, dim: Int)
      : (Array[Array[Double]], Array[Double], Long) = {
    val vecs = df.filter(col(vecCol).isNotNull)
    val momentsCol = GraftBridge.column(VectorMomentsAgg(
      GraftBridge.expression(vecs.col(vecCol)), dim).toAggregateExpression())
    val m = vecs.agg(momentsCol.as("m")).head().getSeq[Double](0).toArray
    val tri = dim * (dim + 1) / 2
    val n = m(tri + dim).toLong
    require(n > 0, "covariance of an empty corpus")
    val mean = Array.tabulate(dim)(i => m(tri + i))
    val cov = Array.ofDim[Double](dim, dim)
    var p = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = m(p) / n
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
        p += 1
      }
      i += 1
    }
    (cov, mean, n)
  }

  /** Integer-exact raw moments of the quantized vector column from one
    * corpus pass: `(Σ q_i·q_j upper triangle row-major, Σ q_i, n)` with
    * `q = ⌊x · 2^scaleBits⌋`. Bit-identical under any partitioning —
    * the correctness-gate form of [[covariance]] (which stays the float
    * production path; covariance is recoverable as
    * `(sxy − sx·sy/n) / (n·2^{2·scaleBits})` to quantization precision).
    */
  def exactMoments(df: DataFrame, vecCol: String, dim: Int,
      scaleBits: Int = 20): (Array[Long], Array[Long], Long) = {
    val vecs = df.filter(col(vecCol).isNotNull)
    val momentsCol = GraftBridge.column(LongVectorMomentsAgg(
      GraftBridge.expression(vecs.col(vecCol)), dim, scaleBits)
      .toAggregateExpression())
    val m = vecs.agg(momentsCol.as("m")).head().getSeq[Long](0).toArray
    val tri = dim * (dim + 1) / 2
    (m.take(tri), m.slice(tri, tri + dim), m(tri + dim))
  }

  /** Eigen-decomposition of a symmetric matrix by cyclic Jacobi
    * rotations: returns `(eigenvalues, eigenvectors)` sorted by
    * descending eigenvalue, eigenvectors as rows. Deterministic; for
    * the dim ≤ few-thousand matrices PCA meets, convergence is a few
    * sweeps.
    */
  def symmetricEigen(a: Array[Array[Double]], sweeps: Int = 50,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = m(p)(q)
          off += apq * apq
          if (math.abs(apq) > tol) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            // θ = 0 means a 45° rotation — signum(0) = 0 would no-op it
            val t = (if (theta == 0.0) 1.0 else math.signum(theta)) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val mkp = m(k)(p); val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < n) {
              val mpk = m(p)(k); val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -m(i)(i))
    (order.map(i => m(i)(i)).toArray,
      order.map(i => Array.tabulate(n)(k => v(k)(i))).toArray)
  }

  /** Fit a `k`-component PCA: `(mean, components (k rows), eigenvalues)`. */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    require(k >= 1 && k <= dim, s"k=$k out of range for dim=$dim")
    val (cov, mean, _) = covariance(df, vecCol, dim)
    val (vals, vecs) = symmetricEigen(cov)
    (mean, vecs.take(k), vals.take(k))
  }

  /** Project the vector column onto literal `components` (rows) after
    * centering on `mean`: an `array<double>` of length k, pure
    * expressions (k × dim multiply-adds per row), map-only.
    */
  def projectColumn(vec: Column, mean: Array[Double],
      components: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.functions.{transform => arrTransform}
    val centered = zip_with(vec, lit(mean), (x, mu) => x.cast("double") - mu)
    val compLit = typedLit(components.map(_.toSeq).toSeq)
    // bind the centered array ONCE as a lambda variable — referencing the
    // subtree per component would re-evaluate the centering k times
    arrTransform(array(centered), c =>
      arrTransform(compLit, comp =>
        aggregate(zip_with(c, comp, (x, w) => x * w),
          lit(0.0), (acc, x) => acc + x))).getItem(0)
  }

  /** `df` plus `pca` (length-k array<double>) from a fitted model. */
  def addProjection(df: DataFrame, vecCol: String, mean: Array[Double],
      components: Array[Array[Double]]): DataFrame =
    df.withColumn("pca", projectColumn(col(vecCol), mean, components))

  /** Whitening matrix: component rows scaled by `1/√(λ + eps)`, so the
    * projected coordinates are decorrelated AND unit-variance — the
    * PCA-whitening preprocessing embedding-dedup recipes (SemDeDup et
    * al.) apply before cosine thresholds, folded into the same map-only
    * projection pass.
    */
  def whiteningComponents(components: Array[Array[Double]],
      eigenvalues: Array[Double], eps: Double = 1e-9): Array[Array[Double]] =
    components.zip(eigenvalues).map { case (c, ev) =>
      val s = 1.0 / math.sqrt(ev + eps)
      c.map(_ * s)
    }
}

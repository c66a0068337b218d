package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nearest-centroid index of a float/double vector column against a
  * BROADCAST centroid matrix — the scale form of
  * [[Similarity.ivfAssign]], whose literal expression tree (k × dim
  * literals, k nested CASEs) stops being compilable around k ≈ 100.
  * Here the matrix travels once per executor as a broadcast (referenced
  * from generated code via a lazily-unwrapped mutable slot, not
  * serialized into the plan), so k can follow the SemDeDup √N rule into
  * the thousands. Ties resolve to the lowest index, exactly like
  * `ivfAssign` (property-tested parity).
  */
case class NearestCentroidExpr(
    child: Expression, // array<float> | array<double>
    bcCentroids: Broadcast[Array[Array[Double]]],
) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest centroid needs array<float|double>, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val centroids: Array[Array[Double]] = bcCentroids.value

  override def nullSafeEval(arrAny: Any): Any =
    KMeans.nearest(arrAny.asInstanceOf[ArrayData], isFloat, centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcCentroids", bcCentroids,
      classOf[Broadcast[Array[Array[Double]]]].getName)
    val cVar = ctx.addMutableState("double[][]", "centroids",
      v => s"$v = (double[][]) $bcRef.value();")
    val helper = KMeans.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $helper.nearest($arr, $isFloat, $cVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

/** The `nProbe` nearest centroid ids (ascending distance, ties to the
  * lower id) as `array<int>` — the multi-probe form of
  * [[NearestCentroidExpr]], used to route ANN queries to their IVF probe
  * lists without a k-wide literal tree.
  */
case class NearestCentroidsExpr(
    child: Expression, // array<float> | array<double>
    bcCentroids: Broadcast[Array[Array[Double]]],
    nProbe: Int,
) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest centroids needs array<float|double>, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val centroids: Array[Array[Double]] = bcCentroids.value

  override def nullSafeEval(arrAny: Any): Any =
    KMeans.nearestK(arrAny.asInstanceOf[ArrayData], isFloat, centroids, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcCentroids", bcCentroids,
      classOf[Broadcast[Array[Array[Double]]]].getName)
    val cVar = ctx.addMutableState("double[][]", "centroidsK",
      v => s"$v = (double[][]) $bcRef.value();")
    val helper = KMeans.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $helper.nearestK($arr, $isFloat, $cVar, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}

/** Element-wise vector sum + row count as ONE aggregation buffer
  * (`dim` running sums and the count in a single `Array[Double]`): the
  * per-cluster statistics pass of Lloyd's update costs one hash probe
  * per ROW instead of the one-per-element of the
  * posexplode-then-groupBy(cluster, dim) form, and the shuffle carries
  * `k` flat buffers per task — independent of corpus size.
  */
case class VectorSumAgg(
    child: Expression, // array<float> | array<double>
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // slots 0..dim-1 = element sums, slot dim = row count,
  // slot dim+1 = Σ|x|² (buys the within-cluster SSE — the k-means
  // inertia/elbow diagnostic — for free in the same pass)
  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim + 2)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vector of length ${arr.numElements()} in a dim-$dim aggregation")
      var i = 0
      while (i < dim) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        buffer(i) += x
        buffer(dim + 1) += x * x
        i += 1
      }
      buffer(dim) += 1.0
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim + 1) { buffer(i) += other(i); i += 1 }
    buffer
  }

  // clone: the buffer is live mutable state — wrapping it uncopied would
  // alias the output onto later updates if the engine evaluates the same
  // buffer more than once (window frames)
  override def eval(buffer: Array[Double]): Any =
    new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate((dim + 2) * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](dim + 2)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

/** Distributed Lloyd k-means over the FULL embedding corpus — the
  * 100 TB path for training the IVF ([[Similarity.ivfTopK]]) and
  * SemDeDup ([[Dedup.semDedupAuto]]) quantizers. The existing
  * [[Similarity.kmeansCentroids]] trains on a bounded driver sample
  * (the standard IVF recipe and fine for coarse quantizers); at
  * petabyte scale a 10k sample under-represents tail clusters, and the
  * √N rule pushes k into the thousands — past what a sample can place.
  *
  * Per iteration: one map-only assignment pass ([[NearestCentroidExpr]]
  * over the broadcast matrix, fused into the scan by whole-stage
  * codegen) feeding one hash aggregation keyed by cluster id whose
  * buffer is the [[VectorSumAgg]] flat array — the shuffle carries
  * k × (dim + 1) doubles PER TASK regardless of corpus size, and only
  * the k-row result (a few MB even at k = 4096, dim = 1024) ever
  * reaches the driver. Iteration stops early when the max centroid
  * shift (L2) drops to `tol`; empty clusters keep their previous
  * centroid (the driver-sample variant does the same).
  */
object KMeans {

  /** Shared by interpreted eval and generated code: index of the
    * centroid with the smallest squared euclidean distance, ties to the
    * lowest index.
    */
  def nearest(arr: ArrayData, isFloat: Boolean, centroids: Array[Array[Double]]): Int = {
    val dim = centroids(0).length
    require(arr.numElements() == dim,
      s"vector of length ${arr.numElements()} vs dim-$dim centroids")
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val ctr = centroids(c)
      var d2 = 0.0
      var i = 0
      while (i < dim) {
        val d = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) - ctr(i)
        d2 += d * d
        i += 1
      }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Nearest-centroid assignment column over a broadcast matrix. */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    GraftBridge.column(NearestCentroidExpr(
      GraftBridge.expression(df.col(vecCol)), bc))
  }

  /** The `k` nearest centroid ids, ascending distance, ties to the lower
    * id — selection by repeated scan (k is a probe count, ≤ tens).
    */
  def nearestK(arr: ArrayData, isFloat: Boolean,
      centroids: Array[Array[Double]], k: Int): ArrayData = {
    val dim = centroids(0).length
    require(arr.numElements() == dim,
      s"vector of length ${arr.numElements()} vs dim-$dim centroids")
    val n = centroids.length
    val d2 = new Array[Double](n)
    var c = 0
    while (c < n) {
      val ctr = centroids(c)
      var s = 0.0
      var i = 0
      while (i < dim) {
        val d = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) - ctr(i)
        s += d * d
        i += 1
      }
      d2(c) = s
      c += 1
    }
    val m = math.min(k, n)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](n)
    var j = 0
    while (j < m) {
      var best = -1
      var bestD = Double.MaxValue
      var cc = 0
      while (cc < n) {
        if (!taken(cc) && d2(cc) < bestD) { bestD = d2(cc); best = cc }
        cc += 1
      }
      if (best < 0) {
        // a NaN element makes EVERY distance NaN, so no comparison fires
        // — fall back to the lowest untaken index, matching [[nearest]]'s
        // behavior (best stays 0) instead of crashing the task with
        // taken(-1)
        var cc2 = 0
        while (best < 0 && cc2 < n) { if (!taken(cc2)) best = cc2; cc2 += 1 }
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Multi-probe assignment: the `nProbe` nearest centroid ids as
    * `array<int>` over a broadcast matrix.
    */
  def assignK(df: DataFrame, vecCol: String, centroids: Array[Array[Double]],
      nProbe: Int): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    GraftBridge.column(NearestCentroidsExpr(
      GraftBridge.expression(df.col(vecCol)), bc, nProbe))
  }

  /** One Lloyd statistics pass: `(cluster, stats)` with `stats` the
    * [[VectorSumAgg]] flat buffer (dim sums + count + Σ|x|²). Exactly
    * one exchange of k flat buffers per task; null vectors are dropped.
    */
  def clusterStats(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    clusterStatsWithBc(df, vecCol,
      df.sparkSession.sparkContext.broadcast(centroids),
      centroids(0).length)

  private def clusterStatsWithBc(df: DataFrame, vecCol: String,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      dim: Int): DataFrame = {
    val vecs = df.filter(col(vecCol).isNotNull)
    val assigned = vecs.select(
      GraftBridge.column(NearestCentroidExpr(
        GraftBridge.expression(vecs.col(vecCol)), bc)).as("cluster"),
      col(vecCol).as("_v"))
    assigned.groupBy("cluster").agg(
      GraftBridge.column(VectorSumAgg(
        GraftBridge.expression(assigned.col("_v")), dim)
        .toAggregateExpression()).as("stats"))
  }

  /** The gate-shaped single update step: per-(cluster, dim) member count
    * and mean — `(cluster, dim, mean_v, n)`, scalar columns, rounded to
    * 6 so the DuckDB oracle's summation order agrees. Runs through the
    * same [[clusterStats]] machinery as [[fit]]; the posexplode fans out
    * only the k aggregated rows, not the corpus.
    */
  def step(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val dim = centroids(0).length
    clusterStats(df, vecCol, centroids)
      .select(col("cluster"),
        posexplode(slice(col("stats"), 1, dim)).as(Seq("dim", "mean_sum")),
        element_at(col("stats"), dim + 1).as("_n"))
      .select(col("cluster"), col("dim").cast("int").as("dim"),
        round(col("mean_sum") / col("_n"), 6).as("mean_v"),
        col("_n").cast("long").as("n"))
  }

  /** Within-cluster sum of squared distances (k-means inertia, the
    * elbow-method diagnostic) of the corpus against `centroids` — ONE
    * [[clusterStats]] pass: per cluster,
    * `Σ|x|² − 2·c·Σx + n·|c|²`, no second corpus scan.
    */
  def inertia(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): Double = {
    val dim = centroids(0).length
    clusterStats(df, vecCol, centroids).collect().map { row =>
      val c = centroids(row.getInt(0))
      val s = row.getSeq[Double](1)
      val n = s(dim)
      val sumSq = s(dim + 1)
      val dot = (0 until dim).map(i => c(i) * s(i)).sum
      val cNorm = c.map(x => x * x).sum
      sumSq - 2.0 * dot + n * cNorm
    }.sum
  }

  /** Iterate Lloyd updates from `init` until the largest centroid L2
    * shift is ≤ `tol` or `maxIter` rounds ran. Returns
    * `(centroids, iterations, lastShift)`.
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      init: Array[Array[Double]],
      maxIter: Int = 20,
      tol: Double = 1e-6,
  ): (Array[Array[Double]], Int, Double) = {
    require(init.nonEmpty, "need at least one initial centroid")
    val dim = init(0).length
    var centroids = init.map(_.clone())
    var iter = 0
    var shift = Double.MaxValue
    while (iter < maxIter && shift > tol) {
      // per-round broadcast destroyed after its one job — iterated fits
      // must not leave executor copies to the ContextCleaner's mercy
      val bc = df.sparkSession.sparkContext.broadcast(centroids)
      val stats =
        try clusterStatsWithBc(df, vecCol, bc, dim).collect()
        finally bc.destroy()
      val next = centroids.map(_.clone()) // empty clusters keep their centroid
      stats.foreach { row =>
        val c = row.getInt(0)
        val s = row.getSeq[Double](1)
        val n = s(dim)
        if (n > 0) next(c) = Array.tabulate(dim)(i => s(i) / n)
      }
      shift = centroids.indices.map { c =>
        math.sqrt((0 until dim).map { i =>
          val d = next(c)(i) - centroids(c)(i); d * d
        }.sum)
      }.max
      centroids = next
      iter += 1
    }
    (centroids, iter, shift)
  }

  /** End-to-end trainer: seed from the bounded driver sample
    * ([[Similarity.kmeansCentroids]] — good initial placement, cheap),
    * then refine over the FULL corpus with [[fit]].
    */
  def fitAuto(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      maxIter: Int = 20,
      tol: Double = 1e-6,
      sampleN: Int = 10000,
  ): (Array[Array[Double]], Int, Double) = {
    val init = Similarity.kmeansCentroids(df, vecCol, idCol, k,
      iters = 5, sampleN = sampleN)
    fit(df, vecCol, init, maxIter, tol)
  }
}

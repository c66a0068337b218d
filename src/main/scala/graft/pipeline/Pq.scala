package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the compression half of the FAISS-style
  * IVF-PQ recipe and the storage answer at 100 TB of embeddings: a
  * dim-float vector becomes `m` small codes (one byte each at k ≤ 256),
  * a 32-256× shrink that turns a petabyte of float32 vectors into a
  * few TB of codes that fit hot storage.
  *
  * Division of labor: codebooks (m × k × dim/m doubles — tiny) train
  * driver-side on a bounded deterministic sample, exactly like FAISS
  * trains on a sample; ENCODING is the corpus-scale pass — map-only,
  * one [[NearestCentroidExpr]] per subspace over its broadcast
  * codebook, fused into the scan. ADC search is another map-only pass:
  * the query's m × k distance lookup table broadcasts as one literal
  * array and each row costs m table lookups — no float vector is ever
  * read back.
  */
object Pq {

  /** `codebooks(s)(c)` = sub-centroid c of subspace s (length subDim). */
  final case class Model(dim: Int, m: Int, codebooks: Array[Array[Array[Double]]]) {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim: Int = dim / m
    def k: Int = codebooks(0).length
  }

  /** Train per-subspace codebooks with driver-side Lloyd on a bounded
    * deterministic sample (ordered by `idCol`). Standard PQ recipe —
    * the codebooks are m·k·subDim doubles regardless of corpus size.
    */
  def fitOnSample(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dim: Int,
      m: Int,
      k: Int,
      sampleN: Int = 10000,
      iters: Int = 10,
  ): Model = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val sample = df.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(sampleN)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= k, s"need >= $k sample vectors, got ${sample.length}")
    val codebooks = Array.tabulate(m) { s =>
      val slices = sample.map(_.slice(s * subDim, (s + 1) * subDim))
      lloyd(slices, k, iters)
    }
    Model(dim, m, codebooks)
  }

  /** Plain driver Lloyd on pre-sliced vectors: deterministic
    * farthest-point init (evenly-spaced picks alias badly when the data
    * cycles through modes, e.g. round-robin shard layouts), empty
    * clusters keep their centroid, ties to the lowest index.
    */
  private def lloyd(xs: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val d = xs(0).length
    var cents = farthestPointInit(xs, k)
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      xs.foreach { x =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d2 = 0.0; var i = 0
          while (i < d) { val t = x(i) - cents(c)(i); d2 += t * t; i += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < d) { sums(best)(i) += x(i); i += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
    }
    cents
  }

  /** k-means++-shaped deterministic seeding: start from the first
    * vector, then repeatedly take the point farthest from every chosen
    * centroid — covers all data modes without randomness.
    */
  private def farthestPointInit(xs: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val minD = Array.fill(xs.length)(Double.MaxValue)
    val out = new Array[Array[Double]](k)
    var chosen = 0
    while (chosen < k) {
      val next =
        if (chosen == 0) 0
        else minD.indices.maxBy(minD) // first max wins ties -> deterministic
      out(chosen) = xs(next).clone()
      var i = 0
      while (i < xs.length) {
        var d2 = 0.0; var j = 0
        while (j < xs(i).length) {
          val t = xs(i)(j) - out(chosen)(j); d2 += t * t; j += 1
        }
        if (d2 < minD(i)) minD(i) = d2
        i += 1
      }
      chosen += 1
    }
    out
  }

  /** `pq_code` column: array of m sub-centroid indices, one broadcast
    * [[NearestCentroidExpr]] per subspace over the sliced vector —
    * map-only, codegen, the corpus-scale encoding pass.
    */
  def encodeColumn(df: DataFrame, vecCol: String, model: Model): Column = {
    val sc = df.sparkSession.sparkContext
    array((0 until model.m).map { s =>
      val bc = sc.broadcast(model.codebooks(s))
      GraftBridge.column(NearestCentroidExpr(
        GraftBridge.expression(
          slice(col(vecCol), s * model.subDim + 1, model.subDim)), bc))
    }: _*)
  }

  /** `df` plus `pq_code`. */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("pq_code", encodeColumn(df, vecCol, model))

  /** Reconstruct (decode) a code array driver-side — the quantization
    * error diagnostic. */
  def decode(code: Array[Int], model: Model): Array[Double] =
    code.zipWithIndex.flatMap { case (c, s) => model.codebooks(s)(c) }

  /** Asymmetric-distance top-k over an ENCODED corpus: squared L2 from
    * the raw query to each row's reconstruction, computed as m lookups
    * into the query's per-subspace distance table (one literal array of
    * m·k doubles — the classic ADC scan). Returns `(idCol, adc_dist)`
    * ascending; per-partition top-k via TakeOrderedAndProject, no
    * global sort.
    */
  def adcTopK(
      encoded: DataFrame, // has codeCol
      codeCol: String,
      idCol: String,
      query: Array[Double],
      model: Model,
      n: Int,
  ): DataFrame = {
    require(query.length == model.dim)
    val lut = Array.tabulate(model.m, model.k) { (s, c) =>
      var d2 = 0.0
      var i = 0
      while (i < model.subDim) {
        val t = query(s * model.subDim + i) - model.codebooks(s)(c)(i)
        d2 += t * t
        i += 1
      }
      d2
    }.flatten
    val dist = aggregate(
      zip_with(col(codeCol), lit((0 until model.m).toArray),
        (c, s) => element_at(lit(lut), s * model.k + c + 1)),
      lit(0.0), (acc, v) => acc + v)
    encoded.select(col(idCol), round(dist, 6).as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(n)
  }

  /** Build the at-rest IVF-PQ index frame: `ivf_list` (coarse quantizer
    * cell — partition the lake by it) + `pq_code`. One map-only pass;
    * persist this instead of the float vectors. PQ here encodes raw
    * vectors, not per-list residuals (the FAISS default) — a documented
    * simplification that trades a little precision for a list-independent
    * codebook, so codes survive coarse-quantizer retraining.
    */
  def ivfPqIndex(
      df: DataFrame,
      vecCol: String,
      coarse: Array[Array[Double]],
      model: Model,
  ): DataFrame =
    df.withColumn("ivf_list", KMeans.assign(df, vecCol, coarse))
      .withColumn("pq_code", encodeColumn(df, vecCol, model))

  /** IVF-PQ search: prune to the `nProbe` coarse lists nearest the
    * query (driver-side — the coarse table is tiny), then ADC-scan only
    * their members. With the lake partitioned by `ivf_list`, the filter
    * is partition pruning: a probe touches nProbe/k_coarse of storage.
    */
  def ivfPqTopK(
      index: DataFrame, // from ivfPqIndex
      idCol: String,
      query: Array[Double],
      coarse: Array[Array[Double]],
      model: Model,
      nProbe: Int,
      n: Int,
  ): DataFrame = {
    val probes = coarse.zipWithIndex.map { case (c, i) =>
      (i, c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy { case (i, d) => (d, i) }.take(nProbe).map(_._1)
    adcTopK(index.filter(col("ivf_list").isin(probes.toIndexedSeq: _*)),
      "pq_code", idCol, query, model, n)
  }

  /** ADC squared distance from a row's raw query vector to a row's code
    * reconstruction — the per-row kernel behind [[PqAdcDistExpr]]. Loop
    * order is fixed (subspace-major, component ascending) so the sum is
    * deterministic per row regardless of partitioning.
    */
  def adcDist(q: ArrayData, qIsFloat: Boolean, code: ArrayData,
      cb: Array[Array[Array[Double]]]): Double = {
    var tot = 0.0
    var s = 0
    while (s < cb.length) {
      val sub = cb(s)(code.getInt(s))
      val base = s * sub.length
      var i = 0
      while (i < sub.length) {
        val qi = if (qIsFloat) q.getFloat(base + i).toDouble
                 else q.getDouble(base + i)
        val d = qi - sub(i)
        tot += d * d
        i += 1
      }
      s += 1
    }
    tot
  }
}

/** ADC distance of a QUERY COLUMN against a CODE COLUMN — the batch
  * form of [[Pq.adcTopK]]'s literal lookup table. adcTopK serves one
  * driver-side query (its m×k LUT is a plan literal); here the query
  * vector is itself a column (millions of queries in one plan), so the
  * LUT trick is unavailable — instead the codebooks travel once per
  * executor as a broadcast and each row pays m·subDim fused
  * multiply-adds in generated code. Used by [[Ivf.searchAllPq]].
  */
case class PqAdcDistExpr(
    left: Expression, // query: array<float> | array<double>
    right: Expression, // pq_code: array<int>
    bcCodebooks: Broadcast[Array[Array[Array[Double]]]],
) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
            ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ADC distance needs (array<float|double>, array<int>), got ($l, $r)")
    }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val codebooks: Array[Array[Array[Double]]] =
    bcCodebooks.value

  override def nullSafeEval(q: Any, code: Any): Any =
    Pq.adcDist(q.asInstanceOf[ArrayData], isFloat,
      code.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcCodebooks", bcCodebooks,
      classOf[Broadcast[Array[Array[Array[Double]]]]].getName)
    val cbVar = ctx.addMutableState("double[][][]", "pqCodebooks",
      v => s"$v = (double[][][]) $bcRef.value();")
    val helper = Pq.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (q, code) =>
      s"${ev.value} = $helper.adcDist($q, $isFloat, $code, $cbVar);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDistExpr =
    copy(left = newLeft, right = newRight)
}

package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen expression: the full MinHash signature in ONE pass over
  * the reduced shingle-hash array.
  *
  * The declarative form — `numHashes` sibling
  * `array_min(transform(base, h => (a·h + b) mod p))` subtrees — walks the
  * base array once per hash function through Catalyst's interpreted
  * higher-order-function machinery (a lambda-variable write + boxed eval
  * per element), allocating `numHashes` intermediate arrays per document.
  * This kernel keeps the running minima in a local `long[]` and visits each
  * shingle hash exactly once: `O(|shingles| · numHashes)` tight Long
  * arithmetic, no allocation beyond the result array.
  *
  * Bit-identical to the declarative form (same affine family, same
  * Mersenne-prime reduction — the DuckDB oracle mirror is unchanged);
  * an empty shingle set yields all-null elements exactly like
  * `array_min(empty)`.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs an array<bigint> input, got $other")
    }

  // coefficient arrays are part of the expression's identity (derived from
  // numHashes/seed, which participate in equals/hashCode via the case class)
  @transient private lazy val coeffA: Array[Long] =
    Dedup.hashCoeffs(numHashes, seed).map(_._1)
  @transient private lazy val coeffB: Array[Long] =
    Dedup.hashCoeffs(numHashes, seed).map(_._2)

  override def nullSafeEval(input: Any): Any =
    MinHashSignatureExpr.compute(
      input.asInstanceOf[ArrayData], coeffA, coeffB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coeffB, "long[]")
    val helper =
      MinHashSignatureExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $helper.compute($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignatureExpr = copy(child = newChild)
}

object MinHashSignatureExpr {

  private val P = (1L << 31) - 1

  /** One-pass signature kernel shared by interpreted eval and codegen.
    * Base hashes must already be reduced below 2^31 (see
    * [[Dedup.baseShingleHashes]]) so `h·a + b < 2^62` never overflows.
    */
  def compute(base: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = base.numElements()
    val k = as.length
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // all null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = base.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

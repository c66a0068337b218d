package graft.pipeline

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native sign-random-projection bucket id — one pass over the vector
  * for ALL hyperplanes, versus the declarative [[Similarity.lshBucket]]
  * composition that re-walks the array through boxed higher-order
  * lambdas once per plane. Value-identical: each plane's dot product
  * accumulates in index order (same association as the strict fold),
  * bit b set iff `dot_b > 0`. The plane matrix travels as a broadcast
  * (one copy per executor, not serialized into the plan).
  *
  * Sits in the LSH blocking paths ([[Similarity.lshBuckets]],
  * [[Dedup.embeddingNearDuplicatesLsh]], [[Dedup]]'s `lshSubBlocks` hot
  * sub-blocking inside semDedup) where it runs once per corpus row.
  */
case class LshBucketExpr(
    child: Expression, // array<float> | array<double>
    bcPlanes: Broadcast[Array[Array[Double]]],
) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh bucket needs array<float|double>, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val planes: Array[Array[Double]] = bcPlanes.value

  override def nullSafeEval(arrAny: Any): Any =
    LshBucketExpr.bucket(arrAny.asInstanceOf[ArrayData], isFloat, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcPlanes", bcPlanes,
      classOf[Broadcast[Array[Array[Double]]]].getName)
    val pVar = ctx.addMutableState("double[][]", "planes",
      v => s"$v = (double[][]) $bcRef.value();")
    val helper = LshBucketExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $helper.bucket($arr, $isFloat, $pVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {

  /** Shared by interpreted eval and generated code. */
  def bucket(arr: ArrayData, isFloat: Boolean, planes: Array[Array[Double]]): Long = {
    val dim = planes(0).length
    require(arr.numElements() == dim,
      s"vector of length ${arr.numElements()} vs dim-$dim planes")
    var out = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var dot = 0.0
      var i = 0
      while (i < dim) {
        dot += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) * p(i)
        i += 1
      }
      if (dot > 0) out |= 1L << b
      b += 1
    }
    out
  }
}

package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native codegen expression: the number of positions where two Long
  * arrays hold the same non-null value — the MinHash signature-agreement
  * count behind the estimated-Jaccard filter.
  *
  * The composed form `size(filter(zip_with(a, b, _ === _), identity))`
  * allocates a boolean array and a filtered copy per evaluated pair; in
  * the LSH band join that is two allocations per CANDIDATE PAIR. This is
  * one branch-predictable loop with no allocation. A null element on
  * either side counts as disagreement (matching the zip_with/filter
  * semantics it replaces: null comparisons drop out of the filter).
  */
case class PositionalEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs two array<bigint> inputs, got $other")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    PositionalEqCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper =
      PositionalEqCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $helper.count($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PositionalEqCount =
    copy(left = newLeft, right = newRight)
}

object PositionalEqCount {

  /** Equal-position count up to the shorter length; null elements never
    * match. Shared by interpreted eval and codegen.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }
}

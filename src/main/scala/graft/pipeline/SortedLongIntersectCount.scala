package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native codegen expression: `|A ∩ B|` for two SORTED Long arrays by
  * linear merge — the pair-join kernel of n-gram Jaccard similarity.
  *
  * `array_intersect` builds a hash set from the left array for every
  * evaluation; inside a blocked self-join the same document's shingle set
  * is rebuilt once per candidate pair (~|block| times). Pre-sorting each
  * document's distinct shingle hashes once in the projection and merging
  * here turns the per-pair cost into a branch-predictable two-pointer
  * scan with no allocation (measured ~4× on the sf0.1 corpus).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
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
    SortedLongIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper =
      SortedLongIntersectCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $helper.count($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {

  /** Two-pointer merge count over sorted arrays (duplicates within one
    * array count once only if already distinct — callers pass
    * distinct-sorted sets). Shared by interpreted eval and codegen.
    */
  def count(a: ArrayData, b: ArrayData): Int = {
    val la = a.numElements()
    val lb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

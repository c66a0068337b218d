package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen kernel: Unicode normalization via `java.text.Normalizer`
  * (see [[TextOps.normalizeUnicode]]). `form` is one of NFC/NFD/NFKC/NFKD,
  * fixed at plan time. Already-normalized input (the overwhelmingly
  * common case for web text) short-circuits through `isNormalized`
  * without allocating.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs a string input, got $other")
    }

  override def nullSafeEval(t: Any): Any =
    UTF8String.fromString(
      UnicodeNormalizeExpr.normalize(t.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper =
      UnicodeNormalizeExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val formRef = ctx.addReferenceObj("graftForm", form, "java.lang.String")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$helper.normalize($t.toString(), $formRef));")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

object UnicodeNormalizeExpr {
  def normalize(s: String, form: String): String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(s, f)) s
    else java.text.Normalizer.normalize(s, f)
  }
}

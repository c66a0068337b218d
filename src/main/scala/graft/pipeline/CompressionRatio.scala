package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the zlib compression-ratio quality signal
  * (`deflate(text).length / text.length`): the CCNet/RefinedWeb-family
  * heuristic that separates boilerplate (highly compressible, ratio
  * ≲ 0.3), natural prose (~0.3-0.6), and random/binary noise (≳ 0.9) in
  * one number — complementary to [[CharEntropyExpr]], which only sees
  * the unigram character distribution and misses long-range repetition.
  *
  * Map-only and codegen-fused like the other text kernels; the Deflater
  * is thread-local (reset per row, never reallocated) because executor
  * task threads are pooled and native zlib allocation per row would
  * dominate. Deterministic for a fixed level (zlib output is fully
  * determined by input + parameters). Empty text → 1.0 (nothing to
  * compress, nothing saved); null stays null.
  */
case class CompressionRatioExpr(child: Expression, level: Int)
    extends UnaryExpression {

  require(level >= 1 && level <= 9, s"deflate level $level not in [1, 9]")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs a string input, got $other")
    }

  override def nullSafeEval(t: Any): Any =
    CompressionRatioExpr.compute(t.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = CompressionRatioExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t, $level);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CompressionRatioExpr = copy(child = newChild)
}

object CompressionRatioExpr {

  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater())
  private val scratch = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](16 * 1024))

  def compute(t: UTF8String, level: Int): Double = {
    val bytes = t.getBytes
    if (bytes.isEmpty) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setLevel(level)
    d.setInput(bytes)
    d.finish()
    val buf = scratch.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}

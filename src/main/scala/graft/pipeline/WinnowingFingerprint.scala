package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernel for the PORTABLE winnowing fingerprint
  * (Schleimer et al.): k-gram polynomial hashes → sliding-window minima →
  * distinct-sorted, in one pass over the text.
  *
  * Bit-identical to the expression-composed
  * [[TextOps.rollingHashFingerprint]] with `hasher = polyHashFixed(_, k,
  * base)` (property-tested), and therefore to the DuckDB oracle SQL
  * ([[graft.OracleSql.rollingFpSql]]). The expression chain materializes
  * a shingle array, a hash array, a window-min array, a distinct copy and
  * a sorted copy per document; this computes the same result with two
  * primitive arrays and no per-window allocation.
  *
  * Shorter-than-k texts produce an empty array (null text stays null —
  * callers coalesce, matching the composed form's empty-array behavior).
  */
case class WinnowingFingerprintExpr(
    child: Expression, k: Int, window: Int, base: Long)
    extends UnaryExpression {

  require(k >= 1 && window >= 1, s"k=$k window=$window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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
    WinnowingFingerprintExpr.compute(
      t.asInstanceOf[UTF8String], k, window, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper =
      WinnowingFingerprintExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      t => s"${ev.value} = $helper.compute($t, $k, $window, ${base}L);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowingFingerprintExpr = copy(child = newChild)
}

object WinnowingFingerprintExpr {

  /** One-pass winnowing: code points → Horner poly hashes mod 2³¹−1 (per-
    * step reduction, the [[TextOps.polyHashFixed]] arithmetic) → window
    * minima → sort + adjacent-dedupe. Shared by interpreted eval and
    * codegen.
    */
  def compute(text: UTF8String, k: Int, window: Int, base: Long): ArrayData = {
    val s = text.toString
    val len = s.length
    // code points (Spark's substring/ascii count code points, not chars)
    var n = 0
    var off = 0
    while (off < len) { off += Character.charCount(s.codePointAt(off)); n += 1 }
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](n)
    off = 0
    var ci = 0
    while (off < len) {
      val cp = s.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val p = TextOps.PolyPrime
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * base + cps(i + j)) % p; j += 1 }
      hs(i) = h
      i += 1
    }
    val wCount = math.max(m - window, 0) + 1
    val mins = new Array[Long](wCount)
    i = 0
    while (i < wCount) {
      var mn = hs(i)
      var j = i + 1
      val end = math.min(i + window, m)
      while (j < end) { if (hs(j) < mn) mn = hs(j); j += 1 }
      mins(i) = mn
      i += 1
    }
    java.util.Arrays.sort(mins)
    var out = 1
    i = 1
    while (i < wCount) {
      if (mins(i) != mins(out - 1)) { mins(out) = mins(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }
}

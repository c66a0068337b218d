package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernel for per-document character Shannon entropy —
  * the classic gibberish/boilerplate/binary-noise quality signal (low
  * entropy = repeated filler, high entropy near log2(alphabet) = random
  * noise; natural English sits ~4.0-4.5 bits/char).
  *
  * One pass over the text's code points into a frequency table, then
  * `H = log2(T) - (Σ c·ln c)/(T·ln 2)` — map-only, fuses into
  * whole-stage codegen, NO explode/groupBy shuffle (the naive
  * per-character explode formulation shuffles len(text) rows per
  * document, which at 100 TB is a corpus-sized exchange for a
  * one-double-per-doc answer). Matches DuckDB's `entropy()` aggregate
  * over the split-character multiset (the oracle for `q_entropy`).
  *
  * Empty text → 0.0 (a single empty-string "character" in the oracle's
  * `string_split` — entropy 0 either way); null stays null.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

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
    CharEntropyExpr.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = CharEntropyExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropyExpr {

  /** Shannon entropy (bits) of the code-point distribution. ASCII counts
    * land in a flat 128-slot array (the overwhelmingly common path);
    * anything higher goes to a spill map — still one pass.
    */
  def compute(t: UTF8String): Double = {
    val s = t.toString
    val ascii = new Array[Int](128)
    var spill: java.util.HashMap[Integer, Integer] = null
    var i = 0
    var total = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (spill == null) spill = new java.util.HashMap[Integer, Integer]()
        spill.merge(cp, 1, (a: Integer, b: Integer) => a + b)
      }
      total += 1
      i += Character.charCount(cp)
    }
    if (total == 0) return 0.0
    var s1 = 0.0 // Σ c·ln c
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 1) s1 += c * math.log(c.toDouble)
      j += 1
    }
    if (spill != null) {
      val it = spill.values().iterator()
      while (it.hasNext) {
        val c = it.next().intValue()
        if (c > 1) s1 += c * math.log(c.toDouble)
      }
    }
    (math.log(total.toDouble) - s1 / total) / math.log(2.0)
  }
}

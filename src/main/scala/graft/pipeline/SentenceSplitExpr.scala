package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rule-based sentence segmentation — the unit breaker for
  * sentence-level dedup, chunking and alignment. RE2/Java-regex
  * lookarounds can't express the abbreviation guard portably, so this is
  * a small scan kernel with exactly-specified rules:
  *
  *  - a boundary is a run of `.`/`!`/`?` followed by whitespace followed
  *    by an uppercase letter, digit, or opening quote/bracket;
  *  - a `.` boundary is suppressed when the preceding token is a known
  *    abbreviation (`Mr`, `Dr`, `Prof`, `vs`, `e.g`, `i.e`, …) or a
  *    single capital initial (`J.`); `!`/`?` always break;
  *  - sentences are trimmed; empties drop; trailing text without a
  *    terminator is the last sentence.
  *
  * Conservative by design (`etc.` never breaks) — for training-data
  * work a missed split is cheaper than a false one.
  */
case class SentenceSplitExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs a string input, got $other")
    }

  override def nullSafeEval(t: Any): Any = {
    val out = SentenceSplitExpr.split(t.asInstanceOf[UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SentenceSplitExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val vals = ctx.freshName("graftSents")
    val arr = ctx.freshName("graftArr")
    val idx = ctx.freshName("graftI")
    nullSafeCodeGen(ctx, ev, t => s"""
      String[] $vals = $helper.split($t.toString());
      Object[] $arr = new Object[$vals.length];
      for (int $idx = 0; $idx < $vals.length; $idx++) {
        $arr[$idx] =
          org.apache.spark.unsafe.types.UTF8String.fromString($vals[$idx]);
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): SentenceSplitExpr =
    copy(child = newChild)
}

object SentenceSplitExpr {

  /** Lowercased abbreviations that suppress a `.` boundary. */
  val Abbreviations: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "st", "mt", "vs", "etc", "e.g",
    "i.e", "jr", "sr", "no", "fig", "al", "inc", "ltd", "co", "approx",
    "a.m", "p.m")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  private def isOpener(c: Char): Boolean =
    Character.isUpperCase(c) || Character.isDigit(c) ||
      c == '"' || c == '\'' || c == '(' || c == '[' ||
      c == '“' || c == '‘'

  /** Token (letters and interior dots) immediately before position `i`
    * (exclusive), trailing dot stripped, lowercased.
    */
  private def tokenBefore(s: String, i: Int): String = {
    var j = i
    while (j > 0 && (Character.isLetter(s.charAt(j - 1)) || s.charAt(j - 1) == '.'))
      j -= 1
    val t = s.substring(j, i)
    (if (t.endsWith(".")) t.substring(0, t.length - 1) else t)
      .toLowerCase(java.util.Locale.ROOT)
  }

  def split(text: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var start = 0
    var i = 0
    def emit(end: Int): Unit = {
      val s = text.substring(start, end).trim
      if (s.nonEmpty) out += s
    }
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        val termStart = i
        var hardBreak = c != '.'
        i += 1
        while (i < n && (text.charAt(i) == '.' || text.charAt(i) == '!' ||
          text.charAt(i) == '?')) {
          if (text.charAt(i) != '.') hardBreak = true
          i += 1
        }
        val termEnd = i
        // require whitespace then an opener
        var j = i
        while (j < n && isWs(text.charAt(j))) j += 1
        val opens = j > i && j < n && isOpener(text.charAt(j))
        val abbrev = !hardBreak && {
          val tok = tokenBefore(text, termStart)
          Abbreviations.contains(tok) ||
            (tok.length == 1 && Character.isUpperCase(text.charAt(termStart - 1)))
        }
        if (opens && !abbrev) { emit(termEnd); start = j; i = j }
      } else i += 1
    }
    emit(n)
    out.toArray
  }
}

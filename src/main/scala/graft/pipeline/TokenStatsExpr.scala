package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: whitespace token count and stopword count
  * of a text column in ONE pass over its UTF-8 bytes, packed as
  * `(n_tokens << 32) | n_stop` — the fused form of
  *
  * {{{ struct(size(tokens(t)), size(filter(tokens(t), isin(stopwords)))) }}}
  *
  * where `tokens(t) = split(trim(t), "\\s+")`. The declarative form runs
  * the `filter` higher-order function interpreted (HOFs are
  * CodegenFallback) with up to 20 `isin` UTF8String comparisons per boxed
  * token — the last interpreted node in the [[TextOps.qualityColumns]]
  * projection (the `text_quality` bench workload).
  *
  * Bit-identity contract (pinned in TokenStatsExprSpec):
  *  - `trim` strips ASCII SPACE (0x20) only — Spark's default one-arg
  *    `trim`, NOT general whitespace;
  *  - `split(s, "\\s+", -1)` is Java-regex split: `\s` is the ASCII class
  *    `[ \t\n\x0B\f\r]` (no UNICODE_CHARACTER_CLASS — U+00A0 etc. are
  *    token bytes), a positive-width match at position 0 contributes a
  *    leading empty token, the negative limit keeps trailing empty
  *    tokens, and the empty string splits to one empty token. All of
  *    those class bytes are < 0x80 and multi-byte UTF-8 sequences contain
  *    no bytes < 0x80, so a byte walk reproduces the codepoint semantics
  *    exactly;
  *  - stopword matching is `isin`'s case-sensitive binary equality
  *    (UTF-8 byte equality); empty tokens never match (stopwords are
  *    required non-empty);
  *  - null text → null (both packed halves unpack to null, matching the
  *    declarative struct's null fields).
  */
case class TokenStopStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  require(stopwords.nonEmpty && stopwords.forall(_.nonEmpty),
    "stopwords must be non-empty strings (an empty stopword would match " +
      "the empty tokens split() emits around leading/trailing whitespace)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs a string input, got $other")
    }

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any =
    TokenStopStatsExpr.compute(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stopBytes", stopBytes, "byte[][]")
    val helper =
      TokenStopStatsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $helper.compute($c, $stopsRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenStopStatsExpr = copy(child = newChild)
}

object TokenStopStatsExpr {

  /** `b` is one of Java-regex `\s`'s ASCII members. */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Token byte-slice `[start, start+len)` equals one of the stopwords. */
  private def isStop(s: UTF8String, start: Int, len: Int,
      stops: Array[Array[Byte]]): Boolean = {
    var w = 0
    while (w < stops.length) {
      val sw = stops(w)
      if (sw.length == len) {
        var i = 0
        while (i < len && s.getByte(start + i) == sw(i)) i += 1
        if (i == len) return true
      }
      w += 1
    }
    false
  }

  /** One-pass (token count, stopword count) over the trimmed bytes,
    * packed `(nTokens << 32) | nStop`. See the class doc for the split()
    * edge semantics being reproduced.
    */
  def compute(s: UTF8String, stops: Array[Array[Byte]]): Long = {
    val nb = s.numBytes()
    // trim: ASCII space only, both ends
    var lo = 0
    while (lo < nb && s.getByte(lo) == 0x20) lo += 1
    var hi = nb
    while (hi > lo && s.getByte(hi - 1) == 0x20) hi -= 1
    // split("") → one empty token
    if (hi == lo) return 1L << 32
    var nTok = 0
    var nStop = 0
    // positive-width separator match at position 0 → leading empty token
    if (isWs(s.getByte(lo))) nTok += 1
    var i = lo
    while (i < hi) {
      while (i < hi && isWs(s.getByte(i))) i += 1
      if (i < hi) {
        val start = i
        while (i < hi && !isWs(s.getByte(i))) i += 1
        nTok += 1
        if (isStop(s, start, i - start, stops)) nStop += 1
      }
    }
    // negative split limit keeps the trailing empty token
    if (isWs(s.getByte(hi - 1))) nTok += 1
    (nTok.toLong << 32) | nStop.toLong
  }
}

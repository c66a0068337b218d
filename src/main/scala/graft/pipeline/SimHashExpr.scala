package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: SimHash of a token array in one pass —
  * the fused form of `simhashFromHashes(tokenHashes(text), bits)`.
  *
  * The declarative form hashed tokens through an interpreted `transform`
  * (for the portable 62-bit polynomial, ~16 expression nodes per token)
  * and then ran `bits` interpreted `size(filter(...))` passes over the
  * hash array — 64 higher-order scans per document. This kernel hashes
  * each token once and accumulates all bit counts in a single local
  * array. Tokenization stays Spark's own `split` (the array input), so
  * its regex/trim edge semantics are untouched.
  *
  * Bit-identity (SimHashExprSpec): same xxhash64 (seed 42) or the same
  * portable two-polynomial codepoint hash ([[TextOps.portableTokenHash]]
  * verbatim: `pmod(poly31(t,8) + len, p) + pmod(poly37(t,8) + 7·len, p)
  * · 2³¹`, out-of-range codepoints read 0), same strict-majority vote
  * (`ones·2 > n` with `n` counting ALL elements and null hashes never
  * voting), null array → 0 (never null — see the `nullable` override:
  * the declarative per-bit `when` chain falls through to `otherwise(0)`
  * on a null array), empty array → 0.
  */
case class SimHashFromTokensExpr(child: Expression, bits: Int, portable: Boolean)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 64, s"bits=$bits out of range")

  override def dataType: DataType = LongType

  // a NULL token array yields signature 0, never null: in the declarative
  // form size(null)/filter(null) are null, so every per-bit `when` falls
  // to otherwise(0) and the OR-reduction is 0 (spec-pinned)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs an array<string> input, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else SimHashFromTokensExpr.compute(v.asInstanceOf[ArrayData], bits, portable)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper =
      SimHashFromTokensExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        |${c.code}
        |long ${ev.value} = ${c.isNull} ? 0L :
        |  $helper.compute(${c.value}, $bits, $portable);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHashFromTokensExpr = copy(child = newChild)
}

object SimHashFromTokensExpr {

  private val P = (1L << 31) - 1
  private val XxSeed = 42L

  def compute(tokens: ArrayData, bits: Int, portable: Boolean): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val h = if (portable) portableHash(t) else XXH64.hashUTF8String(t, XxSeed)
        var bit = 0
        while (bit < bits) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1
          bit += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < bits) {
      // strict majority over ALL elements (null hashes never vote, but
      // still count in n — size(filter(...)) * 2 > size(hashes))
      if (counts(bit) * 2L > n) sig |= 1L << bit
      bit += 1
    }
    sig
  }

  /** [[TextOps.portableTokenHash]] verbatim: two 8-char Horner codepoint
    * polynomials (bases 31/37, mod 2³¹−1, out-of-range codepoints 0),
    * length-mixed and packed into bits 0..61.
    */
  private def portableHash(t: UTF8String): Long = {
    val nb = t.numBytes()
    var h1 = 0L
    var h2 = 0L
    var chars = 0
    var b = 0
    while (b < nb) { // first pass: the two polynomials over ≤ 8 codepoints
      if (chars < 8) {
        val cp = codePointAt(t, b, nb)
        h1 = (h1 * 31L + cp) % P
        h2 = (h2 * 37L + cp) % P
      }
      b += UTF8String.numBytesForFirstByte(t.getByte(b))
      chars += 1
    }
    // codepoints beyond the string's end read as 0 for the polynomials
    var pad = chars
    while (pad < 8) { h1 = (h1 * 31L) % P; h2 = (h2 * 37L) % P; pad += 1 }
    val len = chars.toLong
    val m1 = (h1 + len) % P
    val m2 = (h2 + len * 7L) % P
    m1 + m2 * (1L << 31)
  }

  private def codePointAt(s: UTF8String, b: Int, nb: Int): Int = {
    val b0 = s.getByte(b) & 0xFF
    val len = UTF8String.numBytesForFirstByte(s.getByte(b))
    if (len == 1 || b + len > nb) return b0
    var cp = len match {
      case 2 => b0 & 0x1F
      case 3 => b0 & 0x0F
      case _ => b0 & 0x07
    }
    var i = 1
    while (i < len) {
      cp = (cp << 6) | (s.getByte(b + i) & 0x3F)
      i += 1
    }
    cp
  }
}

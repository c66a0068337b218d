package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernel for [[Dsir.featureBuckets]]: whitespace
  * tokenization + the portable two-polynomial hash of every unigram and
  * space-joined bigram, reduced mod `numBuckets`, in ONE pass over the
  * text.
  *
  * Bit-identical to the expression-composed form (property-tested),
  * and therefore to the DuckDB oracle SQL: the composed form expands
  * the fixed-8 polynomial into ~80 expression nodes PER FEATURE and
  * re-concatenates every bigram string; this computes the same buckets
  * from each token's first-8 code points and code-point length without
  * materializing token or bigram strings at all.
  *
  * Mirrored semantics, exactly as `split(trim(text), "\\s+")` produces
  * them: `trim` strips ASCII spaces only, Java `\s` is the ASCII
  * whitespace class, a leading separator yields an initial empty token,
  * a trailing separator (tab/newline — trim leaves those) yields a
  * final empty token (split's limit is -1), and an empty trimmed text
  * is the single empty token. Null text stays null (callers explode or
  * coalesce).
  */
case class FeatureBucketsExpr(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  require(numBuckets > 0, s"numBuckets=$numBuckets")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

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
    FeatureBucketsExpr.compute(t.asInstanceOf[UTF8String], numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper =
      FeatureBucketsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      t => s"${ev.value} = $helper.compute($t, $numBuckets);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): FeatureBucketsExpr = copy(child = newChild)
}

object FeatureBucketsExpr {

  private def isWs(c: Char): Boolean = // Java \s (ASCII class)
    c == ' ' || c == '\t' || c == '\n' || c == '\u000b' || c == '\f' || c == '\r'

  /** The portable 62-bit token hash ([[TextOps.portableTokenHash]]) from
    * a token's first-8 code points (zero-padded) and code-point length.
    */
  private def tokenHash(cps: Array[Int], len: Int): Long = {
    val p = TextOps.PolyPrime
    var h1 = 0L
    var h2 = 0L
    var j = 0
    while (j < 8) {
      val c = cps(j)
      h1 = (h1 * 31 + c) % p
      h2 = (h2 * 37 + c) % p
      j += 1
    }
    h1 = (h1 + len) % p
    h2 = (h2 + len.toLong * 7) % p
    h1 + h2 * (1L << 31)
  }

  /** Shared by interpreted eval and codegen. */
  def compute(text: UTF8String, numBuckets: Int): ArrayData = {
    val s = text.toString
    // trim: ASCII spaces only (Spark/DuckDB trim semantics)
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    // split on \s+ runs, Java limit=-1 semantics: a leading run yields
    // an initial empty token, a trailing run a final empty token
    val starts = new java.util.ArrayList[Int]
    val ends = new java.util.ArrayList[Int]
    var i = lo
    var start = lo
    while (i < hi) {
      if (isWs(s.charAt(i))) {
        starts.add(start); ends.add(i)
        while (i < hi && isWs(s.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    starts.add(start); ends.add(hi)
    val nTok = starts.size()
    // per token: first-8 code points (zero-padded) + code-point length
    val cp8 = new Array[Array[Int]](nTok)
    val cpLen = new Array[Int](nTok)
    var t = 0
    while (t < nTok) {
      val cps = new Array[Int](8)
      var n = 0
      var off = starts.get(t)
      val until = ends.get(t)
      while (off < until) {
        val cp = s.codePointAt(off)
        if (n < 8) cps(n) = cp
        n += 1
        off += Character.charCount(cp)
      }
      cp8(t) = cps
      cpLen(t) = n
      t += 1
    }
    val b = numBuckets.toLong
    val nBi = math.max(nTok - 1, 0)
    val out = new Array[Int](nTok + nBi)
    t = 0
    while (t < nTok) {
      out(t) = (tokenHash(cp8(t), cpLen(t)) % b).toInt
      t += 1
    }
    // bigram "a b": first-8 code points of the concat assemble from a's
    // prefix, the space (iff it lands inside the window), then b's prefix
    t = 0
    while (t < nBi) {
      val w = new Array[Int](8)
      var n = 0
      val la = cpLen(t)
      var k = 0
      val aTake = math.min(la, 8)
      while (n < 8 && k < aTake) { w(n) = cp8(t)(k); n += 1; k += 1 }
      if (n < 8 && la < 8) { w(n) = ' '.toInt; n += 1 }
      k = 0
      val lb = cpLen(t + 1)
      val bTake = math.min(lb, 8)
      while (n < 8 && k < bTake) { w(n) = cp8(t + 1)(k); n += 1; k += 1 }
      out(nTok + t) = (tokenHash(w, la + 1 + lb) % b).toInt
      t += 1
    }
    new GenericArrayData(out)
  }
}

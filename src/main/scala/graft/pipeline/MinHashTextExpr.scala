package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: text → full MinHash signature in ONE pass
  * over the string's bytes — the fused form of
  * `minhashFromBase(baseShingleHashes(text, k), numHashes, seed)` on the
  * default (xxhash64) hash path.
  *
  * The declarative pipeline it replaces evaluates, per document, four
  * interpreted higher-order passes (Catalyst higher-order functions are
  * CodegenFallback): `sequence` materializes a boxed index array,
  * `transform(substr)` allocates one UTF8String copy per shingle
  * position, `array_distinct` builds a hash set over those strings, and a
  * second `transform(pmod(xxhash64))` boxes one Long per shingle — ~6.5 µs
  * of allocation-heavy interpreted work per 300-char document where the
  * arithmetic itself is ~0.3 µs (MinhashProbe, NOTES round-19 ledger).
  * This kernel walks the UTF-8 bytes once, hashing each k-char shingle
  * IN PLACE (`XXH64.hashUnsafeBytes` over the parent string's buffer —
  * a codepoint substring of UTF-8 is a contiguous byte slice, so no copy)
  * and folding it into the running minima immediately.
  *
  * Bit-identical to the declarative form, including edge semantics:
  *  - same shingle byte content → same `xxhash64` (seed 42, Spark's
  *    string-hash default) → same `pmod(·, 2^31−1)` reduction → same
  *    seeded affine family and min-reduction as [[MinHashSignatureExpr]];
  *  - `array_distinct` is dropped because a min over a multiset equals
  *    the min over its support — duplicate shingles cannot change any
  *    signature position;
  *  - texts shorter than `k` (including empty) produce the all-null
  *    signature, exactly like `array_min(empty)` downstream of the old
  *    `when(length >= k, …).otherwise(array())` guard;
  *  - a NULL text ALSO produces the all-null signature (never a null
  *    array): the old guard's null predicate fell through to
  *    `otherwise(array())`, so the output is non-nullable — pinned in
  *    MinHashTextExprSpec.
  */
case class MinHashTextExpr(child: Expression, k: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {

  require(k >= 1, s"shingle size k=$k must be >= 1")
  require(numHashes >= 1, s"numHashes=$numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  // null text maps to the all-null signature, same as the declarative
  // guard's otherwise(array()) branch — the output itself is never null
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs a string input, got $other")
    }

  @transient private lazy val coeffA: Array[Long] =
    Dedup.hashCoeffs(numHashes, seed).map(_._1)
  @transient private lazy val coeffB: Array[Long] =
    Dedup.hashCoeffs(numHashes, seed).map(_._2)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    MinHashTextExpr.compute(v.asInstanceOf[UTF8String], k, coeffA, coeffB)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coeffB, "long[]")
    val helper =
      MinHashTextExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val c = child.genCode(ctx)
    val in = ctx.freshName("minhashText")
    ev.copy(
      code = code"""
        |${c.code}
        |org.apache.spark.unsafe.types.UTF8String $in =
        |  ${c.isNull} ? null : ${c.value};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  (org.apache.spark.sql.catalyst.util.ArrayData)
        |    $helper.compute($in, $k, $aRef, $bRef);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashTextExpr = copy(child = newChild)
}

object MinHashTextExpr {

  private val P = (1L << 31) - 1
  private val XxSeed = 42L // Spark's xxhash64(...) default seed

  /** One-pass text → signature kernel shared by interpreted eval and
    * codegen. Walks codepoint starts exactly like `UTF8String.substring`
    * (so char-k-gram boundaries match the declarative `substr` shingles),
    * hashes each k-gram byte slice in place, reduces it mod 2^31−1 and
    * folds it into the `numHashes` running minima.
    */
  def compute(s: UTF8String, k: Int,
      as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = as.length
    if (s == null) return new GenericArrayData(new Array[Any](n))
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    var mins: Array[Long] = null
    // ring buffer of the byte offsets of the last k+1 codepoint starts
    val ring = new Array[Int](k + 1)
    var charIdx = 0
    var b = 0
    while (b < nb) {
      ring(charIdx % (k + 1)) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      charIdx += 1
      if (charIdx >= k) {
        val start = ring((charIdx - k) % (k + 1))
        // clamp like UTF8String.substring does on a truncated final char
        val end = if (b < nb) b else nb
        var h = XXH64.hashUnsafeBytes(base, off + start, end - start, XxSeed) % P
        if (h < 0) h += P // pmod
        if (mins == null) {
          mins = new Array[Long](n)
          java.util.Arrays.fill(mins, Long.MaxValue)
        }
        var j = 0
        while (j < n) {
          val v = (h * as(j) + bs(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
    }
    if (mins == null) new GenericArrayData(new Array[Any](n))
    else new GenericArrayData(mins)
  }
}

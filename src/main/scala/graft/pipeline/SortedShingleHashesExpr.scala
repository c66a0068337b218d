package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expression: the distinct-sorted xxhash64 char-k-gram
  * set of a string in one pass — the fused form of
  * `array_sort(array_distinct(transform(charShingles(text, k),
  * xxhash64)))`, the per-document projection of
  * [[Dedup.ngramJaccardPairs]] (and through it the fuzzy-cluster
  * queries).
  *
  * The declarative form runs three interpreted higher-order passes per
  * document (HOFs are CodegenFallback) and allocates one UTF8String copy
  * per shingle position; this kernel hashes each k-char byte slice in
  * place against the parent buffer (same walk as [[MinHashTextExpr]]),
  * sorts, and dedups in a single long[].
  *
  * Bit-identical: same xxhash64 (seed 42) over the same byte slices;
  * `array_distinct` on the HASH array equals sort+dedup of the same
  * values; `array_sort` on non-null longs is signed ascending, exactly
  * `java.util.Arrays.sort(long[])`. Null and shorter-than-k text both
  * produce the EMPTY array (never null), like the old
  * `when(length >= k, …).otherwise(array())` guard.
  */
case class SortedShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle size k=$k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

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

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    SortedShingleHashesExpr.compute(v.asInstanceOf[UTF8String], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper =
      SortedShingleHashesExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val c = child.genCode(ctx)
    val in = ctx.freshName("shingleText")
    ev.copy(
      code = code"""
        |${c.code}
        |org.apache.spark.unsafe.types.UTF8String $in =
        |  ${c.isNull} ? null : ${c.value};
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  (org.apache.spark.sql.catalyst.util.ArrayData)
        |    $helper.compute($in, $k);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedShingleHashesExpr = copy(child = newChild)
}

object SortedShingleHashesExpr {

  private val XxSeed = 42L
  private val Empty = new GenericArrayData(new Array[Long](0))

  def compute(s: UTF8String, k: Int): ArrayData = {
    if (s == null) return Empty
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    val ring = new Array[Int](k + 1)
    var hashes: Array[Long] = null
    var count = 0
    var charIdx = 0
    var b = 0
    while (b < nb) {
      ring(charIdx % (k + 1)) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      charIdx += 1
      if (charIdx >= k) {
        val start = ring((charIdx - k) % (k + 1))
        val end = if (b < nb) b else nb
        if (hashes == null) hashes = new Array[Long](nb) // ≥ shingle count
        hashes(count) =
          XXH64.hashUnsafeBytes(base, off + start, end - start, XxSeed)
        count += 1
      }
    }
    if (count == 0) return Empty
    java.util.Arrays.sort(hashes, 0, count)
    var out = 1
    var i = 1
    while (i < count) {
      if (hashes(i) != hashes(out - 1)) { hashes(out) = hashes(i); out += 1 }
      i += 1
    }
    val res = new Array[Long](out)
    System.arraycopy(hashes, 0, res, 0, out)
    new GenericArrayData(res)
  }
}

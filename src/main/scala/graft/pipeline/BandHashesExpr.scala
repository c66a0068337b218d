package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen expression: all LSH band hashes of a MinHash signature
  * in one pass — `array<long>` of length `bands`, element `b` hashing
  * signature positions `[b·rows, (b+1)·rows)`.
  *
  * Replaces the declarative
  * `transform(sequence(0, bands−1), b => xxhash64(concat_ws("_",
  * slice(sig, b·rows+1, rows))))`, which is interpreted (higher-order
  * functions are CodegenFallback) and allocates, per band, a slice array
  * plus a formatted string of the four longs just to feed a byte hash.
  * This kernel chains `XXH64.hashLong` over the band's longs directly.
  *
  * The band-hash VALUES change (different hash function), but every
  * consumer keys on band-hash EQUALITY only: equal band slices hash
  * equal by construction on both forms, unequal slices collide with
  * probability ~2⁻⁶⁴ on either, and candidate pairs are verified against
  * the full signatures downstream. The DuckDB oracle compares band
  * SLICES, not hashes (OracleSql.minhashPairsSql), so oracle parity is
  * untouched — pinned by the gate and by BandHashesExprSpec's pair-set
  * parity against the declarative form. Null signature positions occur
  * only as the all-null signature of null/short text (min over an empty
  * shingle set); a null element folds in a fixed tag, so all-null slices
  * keep hashing equal to each other exactly like the old
  * `concat_ws`-skips-nulls behavior grouped them.
  */
case class BandHashesExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  require(bands >= 1 && rows >= 1, s"bands=$bands rows=$rows must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs an array<bigint> input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    BandHashesExpr.compute(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = BandHashesExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $helper.compute($c, $bands, $rows);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BandHashesExpr = copy(child = newChild)
}

object BandHashesExpr {

  private val Seed = 42L
  // folded in for a null signature position, so a null never collides
  // with a real value by accident (and all-null slices stay mutually equal)
  private val NullTag = 0x9E3779B97F4A7C15L

  /** One-pass band hashing shared by interpreted eval and codegen. The
    * signature may be shorter than `bands × rows` only via misuse; the
    * loop clamps defensively like `slice` would truncate.
    */
  def compute(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val n = sig.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Seed
      var i = b * rows
      val end = math.min(i + rows, n)
      while (i < end) {
        h =
          if (sig.isNullAt(i)) XXH64.hashLong(NullTag, h)
          else XXH64.hashLong(sig.getLong(i), h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

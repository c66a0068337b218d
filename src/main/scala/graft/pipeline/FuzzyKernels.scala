package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen kernels for [[Fuzzy.editSimilarityPairs]]'s guarded
  * (census-sub-blocked) path. Both replace interpreted higher-order
  * expressions that ran per CANDIDATE PAIR or per probe row on the
  * quadratic side of the blocked join — the round-19 decomposition
  * measured the q_fuzzy_pairs fixture (degenerate fixed-length blocks,
  * ~84 M joined candidates) at 23 s, almost all of it the interpreted
  * `zip_with` dedup filter and the nested-`transform` minhash vectors.
  *
  * Bit-identity contracts (pinned in FuzzyKernelsSpec): candidate
  * BUCKETING must not move — a true pair dropped by a reshuffled bucket
  * layout would change the emitted pair set — so [[SubBandMinhashes]]
  * reproduces `pmod(coalesce(array_min(transform(qg, g =>
  * xxhash64(g, i))), 0), buckets)` exactly (same per-child XXH64
  * chaining Spark's `xxhash64(g, i)` does: hashLong(g, 42) then
  * hashInt(i, ·)), and [[FirstEqualIndex]] reproduces
  * `array_position(zip_with(a, b, (x, y) => x === y), true)`.
  */
case class SubBandMinhashes(left: Expression, right: Expression, subBands: Int)
    extends BinaryExpression {

  require(subBands >= 1, s"subBands=$subBands must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs (array<bigint>, bigint), got $other")
    }

  override def nullSafeEval(qg: Any, buckets: Any): Any =
    SubBandMinhashes.compute(qg.asInstanceOf[ArrayData], subBands,
      buckets.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SubBandMinhashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (q, b) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $helper.compute($q, $subBands, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubBandMinhashes =
    copy(left = newLeft, right = newRight)
}

object SubBandMinhashes {

  private val Seed = 42L // Spark's xxhash64(...) default seed

  /** `out(i) = pmod(min over g of xxhash64(g, i), buckets)` with the
    * empty-set min coalesced to 0 — one pass over the q-gram array for
    * all sub-bands instead of `subBands` interpreted transforms.
    * `xxhash64(g, i)` chains per child exactly like Spark's expression:
    * `hashInt(i, hashLong(g, 42))` (the band index is an IntegerType
    * literal in the declarative form), INCLUDING the null-element fold —
    * Spark's xxhash64 leaves the running hash unchanged for a null
    * child, so a null q-gram contributes `hashInt(i, 42)` to the min
    * (unreachable from [[Fuzzy.qgramsOf]], whose elements are non-null,
    * but the bit-identity contract holds for it anyway).
    */
  def compute(qg: ArrayData, subBands: Int, buckets: Long): ArrayData = {
    val n = qg.numElements()
    val out = new Array[Long](subBands)
    var i = 0
    while (i < subBands) {
      var min = Long.MaxValue
      var any = false
      var j = 0
      while (j < n) {
        // null element: xxhash64's fold skips the null child, so the
        // element's hash is hashInt(i, seed) — not "no contribution"
        val h =
          if (qg.isNullAt(j)) XXH64.hashInt(i, Seed)
          else XXH64.hashInt(i, XXH64.hashLong(qg.getLong(j), Seed))
        if (!any || h < min) { min = h; any = true }
        j += 1
      }
      val v = if (any) min else 0L // coalesce(array_min(empty), 0)
      val m = v % buckets
      out(i) = if (m < 0) m + buckets else m // pmod
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** 1-based index of the first position where both arrays hold equal
  * non-null longs; 0 when none — bit-identical to
  * `array_position(zip_with(a, b, (x, y) => x === y), true)` for
  * equal-length long arrays (zip_with's null padding and EqualTo's
  * null→null both mean "not a match", which array_position skips).
  */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs two array<bigint> inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    FirstEqualIndex.find(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = FirstEqualIndex.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $helper.find($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
}

object FirstEqualIndex {

  def find(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        return i + 1
      i += 1
    }
    0
  }
}

/** 64-bit presence sketch of a hashed q-gram array: OR of
  * `1L << (h & 63)` over the elements (nulls skipped; empty → 0L). Feeds
  * the EXACT bit prefilter of [[Fuzzy.editSimilarityPairs]]'s candidate
  * join: every multiset-matched q-gram instance of `a` has its bit set in
  * `b`'s sketch, so `popcount(bits(a) & ~bits(b)) ≤ |Q(a)| − I` where `I`
  * is the multiset intersection the Ukkonen filter bounds — a pair that
  * would pass Ukkonen can NEVER fail this test, so inserting it before
  * the array merge drops only pairs the merge would drop (cheap long ops
  * instead of a two-pointer scan per candidate).
  */
case class Bits64OfHashes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

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
    Bits64OfHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Bits64OfHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Bits64OfHashes = copy(child = newChild)
}

object Bits64OfHashes {
  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    var bits = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) bits |= 1L << (a.getLong(i) & 63L)
      i += 1
    }
    bits
  }
}

package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** `RLIKE` with an executor-side compiled-pattern cache for NON-FOLDABLE
  * pattern columns.
  *
  * Spark's `regexp_like` only caches the compiled `Pattern` when the
  * pattern is a literal; with a per-row pattern column (the robots.txt
  * wildcard-rule join — [[Robots.filterAllowed]]) it recompiles the regex
  * for every URL×rule row even though the distinct pattern set is tiny
  * (one per wildcard rule). This expression routes matching through a
  * bounded process-wide cache: one `Pattern.compile` per distinct
  * pattern per executor, a hash lookup per row, and the static-call
  * codegen keeps the surrounding projection inside whole-stage codegen.
  *
  * Match semantics are `RLIKE`'s (unanchored partial match via
  * `Matcher.find`); [[Robots.wildcardRegex]] emits `^`-anchored patterns,
  * so prefix anchoring comes from the pattern itself, as with the
  * built-in.
  */
case class CachedRegexpLike(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"needs two string inputs, got $other")
    }

  override def nullSafeEval(s: Any, p: Any): Any =
    CachedRegexpLike.matches(
      s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper =
      CachedRegexpLike.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (s, p) => s"${ev.value} = $helper.matches($s, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CachedRegexpLike =
    copy(left = newLeft, right = newRight)
}

object CachedRegexpLike {

  /** Process-wide compiled-pattern cache. Bounded by EVICT-ONE at 1024
    * entries: an insert over the cap removes one resident entry (the
    * iterator's first — effectively random under ConcurrentHashMap), so
    * an adversarial >1024-distinct-pattern rule set degrades to
    * one-compile-per-miss instead of the pre-round-11 clear-all, which
    * thrashed compile→clear→compile across every executor thread sharing
    * the JVM. Robots wildcard-rule sets are orders of magnitude smaller,
    * so eviction is a correctness backstop, not an expected event (a
    * strict LRU would buy nothing at this cardinality and cost
    * bookkeeping per row).
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private val MaxEntries = 1024

  def matches(s: UTF8String, p: UTF8String): Boolean = {
    val ps = p.toString
    var pat = cache.get(ps)
    if (pat == null) {
      if (cache.size() >= MaxEntries) {
        // evict one arbitrary resident (racing threads may each evict
        // one — size stays within MaxEntries ± nThreads and the cache
        // never empties; eviction only drops a compiled object, never a
        // rule, so matching stays correct)
        val it = cache.keySet().iterator()
        if (it.hasNext) cache.remove(it.next())
      }
      pat = java.util.regex.Pattern.compile(ps)
      cache.put(ps, pat)
    }
    pat.matcher(s.toString).find(0)
  }
}

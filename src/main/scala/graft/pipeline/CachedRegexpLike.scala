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

  /** Process-wide compiled-pattern cache. Bounded by FIFO EVICT-ONE at
    * 1024 entries: an insert over the cap atomically polls the oldest
    * inserted key off `order` and removes it, so an adversarial
    * >1024-distinct-pattern rule set degrades to one-compile-per-miss
    * instead of the pre-round-11 clear-all, which thrashed
    * compile→clear→compile across every executor thread sharing the
    * JVM. The victim queue is the load-bearing detail under
    * concurrency: a "remove the iterator's first key" scheme has every
    * racing thread evict the SAME entry (one removal for N inserts —
    * the cache creeps past the cap, property-test-measured +1086 over a
    * 3000-pattern churn), where `poll()` hands each thread a distinct
    * victim and the size stays within cap ± nThreads. Eviction only
    * drops a compiled object, never a rule, so matching stays correct;
    * robots wildcard-rule sets are orders of magnitude smaller than the
    * cap, so eviction is a correctness backstop, not an expected event.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val MaxEntries = 1024

  /** Test hook: resident compiled patterns (bounded ≈ MaxEntries). */
  private[pipeline] def cacheSize: Int = cache.size()

  def matches(s: UTF8String, p: UTF8String): Boolean = {
    val ps = p.toString
    var pat = cache.get(ps)
    if (pat == null) {
      if (cache.size() >= MaxEntries) {
        // FIFO eviction: poll until one removal succeeds (a polled key
        // may already be gone if it was evicted-then-reinserted — its
        // stale queue entry is skipped, the live one is still queued)
        var victim = order.poll()
        while (victim != null && cache.remove(victim) == null)
          victim = order.poll()
      }
      pat = java.util.regex.Pattern.compile(ps)
      val prev = cache.putIfAbsent(ps, pat)
      if (prev == null) order.add(ps) // we won the insert — queue once
      else pat = prev // lost the race — use the winner's atomically
    }
    pat.matcher(s.toString).find(0)
  }
}

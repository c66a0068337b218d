package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.SpecificInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

import graft.binning.HistogramKernel

/** Native count-by-Long-key: the whole-operator Catalyst form of
  * [[graft.binning.HistogramPlan.Kernel]] / `RawShuffle`.
  *
  * The Dataset form (`as[Long].mapPartitions(countKeys)`) pays a
  * `DeserializeToObject` / `SerializeFromObject` boundary on EVERY row of
  * BOTH kernel passes — ~2×10⁸ boxed `java.lang.Long`s at the reference
  * shape, pure allocator traffic. This operator consumes the child's
  * UnsafeRows directly: a logical node ([[CountByKeyPlan]]), a planner
  * strategy ([[CountByKeyStrategy]], registered per-session through
  * `spark.experimental.extraStrategies`), and a physical exec
  * ([[CountByKeyExec]]) whose FINAL side declares
  * `ClusteredDistribution(key)` so `EnsureRequirements` inserts the one
  * hash exchange — Spark's own machinery places and reuses the shuffle
  * like a built-in aggregate's. The exchange width is pinned to
  * [[graft.binning.HistogramKernel.mergePartitions]]'s sizing
  * (`requiredNumPartitions`), which intentionally takes AQE's
  * post-shuffle coalescing out of the loop: the merge map's memory is
  * the constraint, not the partition byte size AQE optimizes for.
  *
  * Two-phase form (skew-safe, the default): partial exec counts each map
  * partition's rows, the exchange moves pre-combined `(key, cnt)` rows,
  * the final exec merges. Single-phase form (`twoPhase = false` — the
  * RawShuffle opt-in): the final exec alone, counting raw keys after the
  * exchange.
  */
final case class CountByKeyPlan(
    child: LogicalPlan,
    numPartitions: Int,
    twoPhase: Boolean,
    cnt: AttributeReference, // constructor arg: `copy` (analyzer/optimizer
                             // child rewrites) must PRESERVE the exprId the
                             // parent plan already resolved against
) extends UnaryNode {
  require(child.output.size == 1 && child.output.head.dataType == LongType,
    s"CountByKeyPlan needs a single LongType key column, got ${child.output}")
  // a nullable key's null rows would be read via getLong(0) and silently
  // counted as key 0 — diverging from groupBy's null-group semantics.
  // Callers filter/compute non-null keys (Binning's `_flat >= 0` filter on
  // the non-nullable FlatBinIndexExpr); demand the plan proves it.
  require(!child.output.head.nullable,
    "CountByKeyPlan needs a non-nullable key column: filter nulls out " +
      "first (a null would silently count as key 0)")

  /** The key attribute, reused from the child (like Aggregate's grouping
    * references). */
  def key: Attribute = child.output.head

  override def output: Seq[Attribute] = Seq(key, cnt)

  // `cnt` originates HERE, not from the child (CheckAnalysis's
  // missing-input rule)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(cnt)

  // the node CONSUMES its child's key column even though no expression
  // argument mentions it — without this, ColumnPruning sees an empty
  // reference set and prunes `_flat` away under any consumer that only
  // reads `cnt` (e.g. histogram(...).agg(sum("cnt")))
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet

  override protected def withNewChildInternal(c: LogicalPlan): CountByKeyPlan =
    copy(child = c)
}

/** Plans [[CountByKeyPlan]] into one or two [[CountByKeyExec]]s, joined
  * by the narrow-wire [[PackedCountExchangeExec]] (varint pairs instead
  * of framed UnsafeRows — same placement, ~5× fewer shuffle bytes at the
  * high-cardinality cube shape). `spark.graft.countByKey.packedExchange`
  * = false falls back to the classic EnsureRequirements exchange.
  */
object CountByKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case c: CountByKeyPlan =>
      val inner =
        if (c.twoPhase)
          CountByKeyExec(partial = true, c.key, c.cnt, c.numPartitions,
            planLater(c.child))
        else planLater(c.child)
      val packed = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.countByKey.packedExchange", "true")
        .toBoolean
      val mid =
        if (packed)
          PackedCountExchangeExec(c.key, c.cnt, c.numPartitions, inner)
        else inner
      CountByKeyExec(partial = false, c.key, c.cnt, c.numPartitions,
        mid) :: Nil
    case _ => Nil
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(CountByKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ CountByKeyStrategy
  }
}

/** Physical open-hash count. `partial = true` counts raw keys with no
  * distribution requirement (runs inside the map stage); the final side
  * requires `ClusteredDistribution(key)` (the planner inserts the hash
  * exchange) and either merges pre-combined rows (two-phase) or counts
  * raw keys (single-phase — its child emits 1-column rows).
  */
final case class CountByKeyExec(
    partial: Boolean,
    key: Attribute,
    cnt: AttributeReference,
    numPartitions: Int,
    child: SparkPlan,
) extends UnaryExecNode {

  override def output: Seq[Attribute] = Seq(key, cnt)

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(cnt)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(Seq(key),
      requiredNumPartitions = Some(numPartitions)))

  override protected def doExecute(): RDD[InternalRow] = {
    // merge pre-combined (key, cnt) rows only when the child actually
    // emits them (the final side of the two-phase form)
    val cntOrdinal = if (!partial && child.output.size == 2) 1 else -1
    // the PARTIAL map flushes at a bounded entry count so a huge
    // non-scan partition (cached/repartitioned upstream) can't OOM the
    // map task — duplicates across flushes merge in the final pass. The
    // FINAL side must stay unbounded (one output row per key); its map is
    // sized by HistogramKernel.mergePartitions' exchange width instead.
    val flush =
      if (partial) conf.getConfString("spark.graft.countByKey.flushEntries",
        HistogramKernel.partialFlushEntries.toString).toInt
      else Int.MaxValue
    // fail misconfiguration HERE (driver side, once) — inside the task
    // iterator it would burn 4 retry attempts per task first
    require(flush > 0,
      s"spark.graft.countByKey.flushEntries must be positive: $flush")
    child.execute().mapPartitions { it =>
      val counted = HistogramKernel.countInternalRows(it, cntOrdinal, flush)
      val proj = UnsafeProjection.create(Array(LongType, LongType): Array[org.apache.spark.sql.types.DataType])
      val row = new SpecificInternalRow(Seq(LongType, LongType))
      counted.map { case (k, c) =>
        row.setLong(0, k)
        row.setLong(1, c)
        proj(row): InternalRow // reused row: consumers copy on buffer
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): CountByKeyExec =
    copy(child = c)
}

object CountByKey {

  /** `(key, cnt)` DataFrame counting `flat`'s single Long column —
    * two-phase (skew-safe) or single-phase raw-shuffle. The strategy is
    * registered on the session on first use.
    */
  def apply(flat: DataFrame, numPartitions: Int, twoPhase: Boolean,
      cntName: String): DataFrame = {
    val spark = flat.sparkSession
    CountByKeyStrategy.register(spark)
    val keyName = flat.columns.head
    val df = GraftBridge.ofRows(spark, CountByKeyPlan(
      GraftBridge.analyzedPlan(flat), numPartitions, twoPhase,
      AttributeReference(cntName, LongType, nullable = false)()))
    // hide the node's produced `cnt` behind a Project alias:
    // DeduplicateRelations knows how to regenerate conflicting Project
    // aliases on a self-join, but not a custom node's produced
    // attribute — without this, joining a kernel-routed histogram with
    // itself dies with INTERNAL_ERROR "conflicting references"
    import org.apache.spark.sql.functions.col
    df.select(col(keyName), col(cntName).as(cntName))
  }
}

package graft.pipeline

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries sketch state: total processed item count plus at most
  * `k` (item → lower-bound count) counters.
  */
final class MGState(var n: Long, val counts: mutable.HashMap[String, Long])

/** Misra–Gries frequent-items aggregate (Misra & Gries 1982; mergeable
  * form per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * One buffer holds ≤ `k` counters; any item with true frequency
  * `> n/(k+1)` is guaranteed to survive, and every stored count
  * underestimates the true count by at most `n/(k+1)` — the bound is
  * preserved under partial-buffer merges, so the sketch parallelizes as
  * a standard partial → final Catalyst aggregation: each task ships one
  * ≤ k-entry map, never its token stream. Shuffle volume is
  * `O(k × partitions)`, independent of corpus size — the property that
  * makes a 100 TB vocabulary census feasible where a full
  * explode-groupBy would shuffle every token occurrence.
  *
  * Output: struct of the exact total `n` and the candidate map. The
  * counts are LOWER BOUNDS — exact top-item reporting re-counts the
  * candidates in a second pass ([[HeavyHitters.heavyHitters]]), the
  * standard two-pass exact heavy-hitters recipe.
  */
case class MisraGriesAgg(
    child: Expression, // item, StringType; null items are skipped
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[MGState] with UnaryLike[Expression] {

  require(k >= 1, s"sketch size must be >= 1, got $k")

  override def createAggregationBuffer(): MGState =
    new MGState(0L, mutable.HashMap.empty)

  override def update(buffer: MGState, input: InternalRow): MGState = {
    val v = child.eval(input)
    if (v != null) {
      buffer.n += 1L
      val item = v.asInstanceOf[UTF8String].toString
      val cur = buffer.counts.getOrElse(item, 0L)
      if (cur > 0L || buffer.counts.size < k) {
        buffer.counts.update(item, cur + 1L)
      } else {
        // classic MG step: unseen item with a full table decrements
        // every counter (the new item's single count included — net
        // effect: drop zeros, do not insert)
        decrementAll(buffer.counts, 1L)
      }
    }
    buffer
  }

  override def merge(buffer: MGState, other: MGState): MGState = {
    buffer.n += other.n
    other.counts.foreach { case (item, c) =>
      buffer.counts.update(item, buffer.counts.getOrElse(item, 0L) + c)
    }
    if (buffer.counts.size > k) {
      // subtract the (k+1)-th largest count from all counters; ≤ k
      // survive and each absorbs the same additional undercount the
      // sequential rule would have charged (Agarwal et al. §3.1)
      val vals = buffer.counts.values.toArray
      java.util.Arrays.sort(vals)
      decrementAll(buffer.counts, vals(vals.length - (k + 1)))
    }
    buffer
  }

  private def decrementAll(m: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    m.mapValuesInPlace((_, c) => c - by)
    m.foreach { case (item, c) => if (c <= 0L) dead += item }
    dead.foreach(m.remove)
  }

  override def eval(buffer: MGState): Any = {
    val items = buffer.counts.toArray
    new GenericInternalRow(Array[Any](
      buffer.n,
      ArrayBasedMapData(
        items.map(e => UTF8String.fromString(e._1)),
        items.map(_._2),
      ),
    ))
  }

  override def serialize(buffer: MGState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.n)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (item, c) =>
      // length-prefixed UTF-8, NOT writeUTF: items are arbitrary corpus
      // strings and writeUTF caps at 64 KB encoded bytes
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val size = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < size) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      m.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    new MGState(n, m)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items",
      MapType(StringType, LongType, valueContainsNull = false),
      nullable = false),
  ))
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

/** Exact heavy-hitters over arbitrary string columns via the standard
  * two-pass recipe: a Misra–Gries candidate sweep (one aggregation,
  * `O(k)` state per task) followed by an exact re-count restricted to
  * the ≤ k candidates. Pass 2's `groupBy` only ever shuffles rows whose
  * item survived the broadcast candidate filter, so its exchange is
  * bounded by the heavy items' own frequency — at 100 TB the full-token
  * dictionary never materializes anywhere.
  */
object HeavyHitters {

  /** One-pass candidate sweep: total non-null item count plus the
    * Misra–Gries candidate map (counts are lower bounds, each within
    * `n/(k+1)` of truth).
    */
  def sketch(df: DataFrame, itemCol: String, k: Int): (Long, Map[String, Long]) = {
    val agg = MisraGriesAgg(
      GraftBridge.expression(df.col(itemCol).cast("string")), k)
      .toAggregateExpression()
    val row = df.agg(GraftBridge.column(agg).as("mg")).head().getStruct(0)
    val n = row.getLong(0)
    (n, row.getMap[String, Long](1).toMap)
  }

  /** Exact `(item, cnt)` rows for every item with frequency
    * `>= ceil(minFrac * n)`. `sketchK` defaults to `2/minFrac`, twice
    * the `1/minFrac` counters the MG superset guarantee needs.
    */
  def heavyHitters(
      df: DataFrame,
      itemCol: String,
      minFrac: Double,
      sketchK: Int = 0,
  ): DataFrame = {
    require(minFrac > 0.0 && minFrac <= 1.0, s"minFrac in (0, 1], got $minFrac")
    val k =
      if (sketchK > 0) sketchK
      else math.max(64, math.ceil(2.0 / minFrac).toInt)
    require(k >= math.ceil(1.0 / minFrac).toInt,
      s"sketchK=$k cannot guarantee items at minFrac=$minFrac " +
        s"(needs >= ${math.ceil(1.0 / minFrac).toInt})")
    val (n, candidates) = sketch(df, itemCol, k)
    val threshold = math.ceil(minFrac * n).toLong
    val item = df.col(itemCol).cast("string")
    df.select(item.as("item"))
      .filter(col("item").isin(candidates.keys.toSeq: _*))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Heavy-hitter TOKENS of a text corpus: whitespace tokens (the
    * corpus-wide tokenization every other TextOps operator uses) with
    * exact counts `>= ceil(minFrac · total tokens)`.
    */
  def heavyHitterTokens(
      df: DataFrame,
      textCol: String,
      minFrac: Double,
      sketchK: Int = 0,
  ): DataFrame =
    heavyHitters(
      df.select(explode(TextOps.tokens(col(textCol))).as("token")),
      "token", minFrac, sketchK)
      .withColumnRenamed("item", "token")

  // --- count-min point-frequency sketches ------------------------------

  /** Per-group count-min frequency sketches (Cormode & Muthukrishnan CM
    * sketch via Spark's `count_min_sketch` aggregate): one
    * `O(depth × width)`-byte binary summary per group that answers "how
    * often does key X occur" for keys chosen AFTER the scan, with
    * one-sided error — estimates only ever overcount, by at most
    * `eps · rows` with probability `confidence`. Completes the sketch
    * triad beside HLL distinct counts ([[Dedup.distinctSketches]]) and
    * Misra–Gries top items ([[MisraGriesAgg]]). Shuffle volume is one
    * sketch per partition per group, independent of corpus size.
    */
  def freqSketches(
      df: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      seed: Int = 42,
  ): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count_min_sketch(col(keyCol).cast("string"), lit(eps),
          lit(confidence), lit(seed)).as("cms"),
        count(col(keyCol)).as("rows"))

  /** Driver-side union of a (small — one row per shard/group) sketch
    * column: CM counters ADD, so the merged sketch answers every query
    * exactly as a monolithic sketch of the concatenated shards would —
    * per-day or per-source sketches roll up to the corpus answer without
    * rescanning. Requires equal eps/confidence/seed across shards
    * (`mergeInPlace` throws on incompatible geometry).
    */
  def freqUnion(
      sketches: DataFrame,
      sketchCol: String = "cms",
  ): org.apache.spark.util.sketch.CountMinSketch = {
    val rows = sketches.select(col(sketchCol)).collect()
    require(rows.nonEmpty, "no sketches to union")
    rows.iterator
      .map(r => org.apache.spark.util.sketch.CountMinSketch
        .readFrom(r.getAs[Array[Byte]](0)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
  }

  /** Point-frequency estimates for `items` (each `>= ` the true count;
    * within `eps · n` of it with the sketch's confidence).
    */
  def freqEstimates(
      sketch: org.apache.spark.util.sketch.CountMinSketch,
      items: Seq[String],
  ): Seq[(String, Long)] =
    items.map(i => i -> sketch.estimateCount(i))
}

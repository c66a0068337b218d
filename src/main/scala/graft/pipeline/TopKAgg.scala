package graft.pipeline

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k heap state: at most `k` (score, id) pairs, min-heap
  * ordered worst-first so the root is the eviction candidate.
  */
final class TopKState(val k: Int) {
  // worst-first: lower score first; equal scores put the HIGHER id first
  // (ties rank by ascending id, so the higher id is the worse entry)
  val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(k, 1),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })
  def offer(score: Double, id: Long): Unit = {
    // NaN scores are dropped like nulls: Double.compare ranks NaN above
    // every real value, so an admitted NaN would displace real results
    // (and invert the ascending-distance users who negate through the
    // heap — the old asc window ranked NaN last)
    if (score.isNaN) return
    if (heap.size < k) heap.add((score, id))
    else {
      val w = heap.peek()
      if (score > w._1 || (score == w._1 && id < w._2)) {
        heap.poll(); heap.add((score, id))
      }
    }
  }
}

/** Grouped top-k as a mergeable aggregate — the scale-safe replacement
  * for `row_number().over(Window.partitionBy(q).orderBy(score))` +
  * `filter(rn <= k)` on candidate-mass inputs.
  *
  * The window form shuffles EVERY candidate row to its query's reducer
  * before any ranking happens — on a batch-search candidate set
  * (queries × Σ df, the f² quantity the ×64 `index64` rehearsal
  * measures) that is the dominant exchange. As a
  * `TypedImperativeAggregate` the ranking gets a partial (map-side)
  * phase: each task ships at most one k-entry heap per query it saw, so
  * the exchange is bounded by `partitions × queries × k` rows instead
  * of the candidate mass.
  *
  * Ordering contract (matches the window form it replaces): descending
  * `score`, ties broken by ascending `id`. Output: `array<struct<id,
  * score>>` best-first — `explode` it back to rows.
  *
  * Tuning note: Spark plans `TypedImperativeAggregate`s as
  * `ObjectHashAggregateExec`, which falls back to SORT-BASED
  * aggregation once a task sees more than
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * groups (default 128) — a full sort of the candidate mass, exactly
  * the cost this aggregate exists to avoid. A batch of Q queries holds
  * only `Q × k × 16 B` of heap in the hash path, so for batch search
  * raise the threshold above the per-task query count (the ×64
  * `index64` rehearsal sets 1e6).
  */
case class TopKAgg(
    left: Expression, // score, DoubleType
    right: Expression, // id, LongType
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[TopKState] with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buffer: TopKState, input: InternalRow): TopKState = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buffer.offer(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKState, other: TopKState): TopKState = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.offer(e._1, e._2)
    }
    buffer
  }

  override def eval(buffer: TopKState): Any = {
    // NON-destructive: eval must not drain the heap — under a window
    // frame (or any engine path that evaluates the same buffer more than
    // once) a polling eval would return the full result once and empty
    // arrays after
    val arr = buffer.heap.toArray(new Array[(Double, Long)](0))
    java.util.Arrays.sort(arr, (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(b._1, a._1) // best (highest) first
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    })
    new GenericArrayData(arr.map(e =>
      new GenericInternalRow(Array[Any](e._2, e._1)): Any))
  }

  override def serialize(buffer: TopKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e._1)
      out.writeLong(e._2)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new TopKState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { st.offer(in.readDouble(), in.readLong()); i += 1 }
    st
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
  )), containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

/** [[TopKState]]'s sibling for STRING ids: the heap carries
  * `(Double, UTF8String)` so string-keyed corpora (URLs, UUIDs — the
  * crawl ingest's own `url` ids) get the same bounded rank exchange as
  * integral ids instead of the full-candidate-mass window fallback.
  * Ordering: ties rank by ascending BINARY string order (UTF8String's
  * byte-wise compare — exactly Spark's own StringType sort order), so
  * the worse of two equal scores is the byte-wise HIGHER id.
  */
final class TopKStrState(val k: Int) {
  val heap = new java.util.PriorityQueue[(Double, UTF8String)](
    math.max(k, 1),
    (a: (Double, UTF8String), b: (Double, UTF8String)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else b._2.compareTo(a._2)
    })
  /** `id` may point into a reused row buffer: the comparison against
    * the heap root reads it in place, and it is CLONED only on the two
    * insert paths — on candidate-mass input nearly every warm-heap row
    * is rejected, so the hot path stays allocation-free like the
    * `(Double, Long)` sibling.
    */
  def offer(score: Double, id: UTF8String): Unit = {
    if (score.isNaN) return
    if (heap.size < k) heap.add((score, id.clone()))
    else {
      val w = heap.peek()
      if (score > w._1 || (score == w._1 && id.compareTo(w._2) < 0)) {
        heap.poll(); heap.add((score, id.clone()))
      }
    }
  }
}

/** [[TopKAgg]] over STRING ids — same contract (descending score, ties
  * to the ascending id, mergeable k-entry heap state), id type
  * `StringType` in and out. Incoming ids are cloned before retention:
  * `eval` hands out UTF8Strings backed by reused UnsafeRow buffers, and
  * retaining one across rows silently corrupts the heap.
  */
case class TopKStrAgg(
    left: Expression, // score, DoubleType
    right: Expression, // id, StringType
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[TopKStrState] with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def createAggregationBuffer(): TopKStrState = new TopKStrState(k)

  override def update(buffer: TopKStrState, input: InternalRow): TopKStrState = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      buffer.offer(s.asInstanceOf[Double], id.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: TopKStrState, other: TopKStrState): TopKStrState = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      buffer.offer(e._1, e._2) // re-clones on insert (bounded: ≤ k rows)
    }
    buffer
  }

  override def eval(buffer: TopKStrState): Any = {
    // non-destructive for the same reason as [[TopKAgg.eval]]
    val arr = buffer.heap.toArray(new Array[(Double, UTF8String)](0))
    java.util.Arrays.sort(arr,
      (a: (Double, UTF8String), b: (Double, UTF8String)) => {
        val c = java.lang.Double.compare(b._1, a._1) // best first
        if (c != 0) c else a._2.compareTo(b._2)
      })
    new GenericArrayData(arr.map(e =>
      new GenericInternalRow(Array[Any](e._2, e._1)): Any))
  }

  override def serialize(buffer: TopKStrState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.heap.size)
    val it = buffer.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e._1)
      val bytes = e._2.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKStrState = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new TopKStrState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val score = in.readDouble()
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      st.offer(score, UTF8String.fromBytes(buf))
      i += 1
    }
    st
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false),
  )), containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKStrAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {
  /** `topK(score, id, k)` as a Column (aggregate). */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKAgg(
      GraftBridge.expression(score),
      GraftBridge.expression(id), k).toAggregateExpression())

  /** [[topK]] for STRING ids ([[TopKStrAgg]]). */
  def topKStr(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKStrAgg(
      GraftBridge.expression(score),
      GraftBridge.expression(id), k).toAggregateExpression())

  /** Set the one session conf the heap aggregates need on a REAL batch:
    * Spark plans `TypedImperativeAggregate`s as `ObjectHashAggregateExec`,
    * which silently falls back to SORT-BASED aggregation past 128
    * distinct groups per task (the SQLConf default) — a full sort of the
    * candidate mass, exactly the cost the heap exists to avoid. Call
    * this once per session before `Ivf.searchAll` / `searchAllPq` /
    * `TextIndex.searchAll` / `Similarity.bruteTopKBatch` with a
    * non-trivial query batch; the hash path's state is only
    * `groups × k × entry` bytes, so a large threshold is safe.
    */
  def tuneForBatchSearch(spark: org.apache.spark.sql.SparkSession,
      maxGroupsPerTask: Long = 1000000L): Unit =
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      maxGroupsPerTask.toString)

  /** Rank `scored` per `groupCol`: top `k` by `scoreCol` descending,
    * ties to the lower `idCol` — the shared rank step of the batch-search
    * operators. Integral ids ride the mergeable [[TopKAgg]] heap and
    * string ids the [[TopKStrAgg]] heap (exchange bounded at
    * partitions × groups × k on both; string ties use Spark's own binary
    * string order); integral ids KEEP their original type on output. Any
    * other id type falls back to the window form — correct, but the rank
    * exchange is the full candidate mass. NaN scores are excluded on
    * every path. See [[tuneForBatchSearch]] for the session conf a real
    * query batch needs.
    */
  def rankTopK(scored: org.apache.spark.sql.DataFrame, groupCol: String,
      idCol: String, scoreCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    scored.schema(idCol).dataType match {
      case idType @ (ByteType | ShortType | IntegerType | LongType) =>
        scored.groupBy(col(groupCol))
          .agg(topK(col(scoreCol), col(idCol).cast("long"), k).as("_top"))
          .select(col(groupCol), explode(col("_top")).as("_e"))
          .select(col(groupCol), col("_e.id").cast(idType).as(idCol),
            col("_e.score").as(scoreCol))
      case StringType =>
        scored.groupBy(col(groupCol))
          .agg(topKStr(col(scoreCol), col(idCol), k).as("_top"))
          .select(col(groupCol), explode(col("_top")).as("_e"))
          .select(col(groupCol), col("_e.id").as(idCol),
            col("_e.score").as(scoreCol))
      case _ =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, col(idCol))
        scored.filter(!isnan(col(scoreCol)))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= k)
          .select(col(groupCol), col(idCol), col(scoreCol))
    }
  }
}

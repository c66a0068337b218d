package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.binning.{BinAxis, Binning}

/** Structured-Streaming surface of the engine.
  *
  * The reference's "datastream" is batch (SURVEY.md §1.1) — the detector
  * writes files that are processed offline. For a live instrument (or a
  * 100 TB ingestion pipeline), the same operators apply incrementally:
  * the per-event transforms (§2.4) are stateless projections that work on
  * streams unchanged; the histogram becomes a streaming aggregation with
  * event-time windows + watermark; the running-calibration state uses
  * `mapGroupsWithState`.
  */
object StreamingBinning {

  /** Continuous N-D histogram over an event stream: per-window sparse
    * cubes, updated incrementally. `tsCol` is the event-time column;
    * late events beyond `watermark` are dropped (bounded state — at
    * 1000 executors the state store only holds the open windows × filled
    * cells, never raw events).
    */
  def windowedHistogram(
      stream: DataFrame,
      axes: Seq[BinAxis],
      tsCol: String,
      windowDuration: String,
      watermark: String = "10 seconds",
      countName: String = "cnt",
  ): DataFrame = {
    val idxCols = axes.map(ax => Binning.binIndex(ax).as(Binning.idxName(ax)))
    val keep = axes.map(ax => col(Binning.idxName(ax)).isNotNull).reduce(_ && _)
    stream
      .withWatermark(tsCol, watermark)
      .select(col(tsCol) +: idxCols: _*)
      .filter(keep)
      .groupBy(
        window(col(tsCol), windowDuration) +:
          axes.map(ax => col(Binning.idxName(ax))): _*)
      .agg(count(lit(1)).as(countName))
  }

  /** Streaming per-event transform passthrough: the calibration chain is
    * stateless, so any `DataFrame => DataFrame` built from §2.4 operators
    * applies to a stream as-is. Provided for discoverability/symmetry.
    */
  def transform(stream: DataFrame, chain: DataFrame => DataFrame): DataFrame =
    chain(stream)

  /** Running per-key statistics via `mapGroupsWithState` — the streaming
    * analog of the driver-side running calibration state (e.g. tracking a
    * per-detector-sector running mean TOF for drift monitoring). State is
    * O(keys), timeout-free here.
    */
  case class SectorState(n: Long, mean: Double)
  case class SectorUpdate(sector: Long, n: Long, mean: Double)

  def runningSectorMeans(
      stream: DataFrame,
      sectorCol: String,
      valueCol: String,
  ): DataFrame = {
    import stream.sparkSession.implicits._
    stream
      .select(col(sectorCol).cast("long").as("sector"),
        col(valueCol).cast("double").as("v"))
      // a single null/uncastable key or value would kill the WHOLE live
      // query ("Null value appeared in non-nullable field" — primitive
      // tuple encoder); a long-running monitor drops dirty rows instead
      // (documented divergence: the batch groupBy keeps a null group)
      .filter(col("sector").isNotNull && col("v").isNotNull)
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[SectorState, SectorUpdate](
        GroupStateTimeout.NoTimeout) {
        case (sector, rows, state: GroupState[SectorState]) =>
          val prev = state.getOption.getOrElse(SectorState(0L, 0.0))
          var n = prev.n
          var mean = prev.mean
          rows.foreach { case (_, v) =>
            n += 1
            mean += (v - mean) / n
          }
          state.update(SectorState(n, mean))
          SectorUpdate(sector, n, mean)
      }
      .toDF()
  }

  /** Streaming ordered funnel — the `mapGroupsWithState` form of
    * [[graft.dfops.DfOps.funnelDepth]]: per-key state is just
    * `(depth, lastStepTs, firstStepTs)`, each micro-batch's events are
    * sorted and folded with the SAME advance rule as the batch
    * operator, and every batch emits the key's current depth
    * (`OutputMode.Update`). Exactly batch-equivalent when events arrive
    * in timestamp order across batches (within a batch, order is
    * irrelevant — the fold sorts); an event older than an
    * already-consumed step is the documented trade-off, same as every
    * watermarkless running-state stream here.
    */
  /** Streaming SCD2 — the CDC form of [[graft.dfops.History.scd2]]:
    * per-key state is just the OPEN interval `(value, valid_from)`;
    * each micro-batch's observations are sorted and folded with the
    * same change-collapse rule as the batch operator, and every CLOSED
    * interval is emitted exactly once (`OutputMode.Append`) the moment
    * the change that closes it arrives. The open interval stays in the
    * state store (O(keys)); batch-equivalent on the closed set when
    * observations arrive in timestamp order across batches — the same
    * ordered-delivery trade-off as every running-state stream here.
    */
  case class Scd2State(value: String, from: Long)
  case class Scd2Closed(key: Long, value: String, valid_from: Long,
      valid_to: Long)

  def scd2Stream(
      stream: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
  ): DataFrame = {
    import stream.sparkSession.implicits._
    stream
      .select(col(keyCol).cast("long").as("k"),
        col(tsCol).cast("long").as("t"), col(valueCol).cast("string").as("v"))
      // null key/ts would kill the live query via the primitive tuple
      // encoder — drop dirty rows (see runningSectorMeans)
      .filter(col("k").isNotNull && col("t").isNotNull)
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[Scd2State]) =>
          // (ts, value) ordering: equal-timestamp changes need a
          // DETERMINISTIC fold — Append-mode closed intervals are
          // irrevocable, and the batch operator exposes the same
          // value-as-tie-break via scd2(tieBreak = Seq(valueCol))
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[Scd2Closed]()
          sorted.foreach { case (_, ts, v) =>
            cur match {
              case None => cur = Some(Scd2State(v, ts))
              case Some(s) if s.value != v =>
                out += Scd2Closed(key, s.value, s.from, ts)
                cur = Some(Scd2State(v, ts))
              case _ => () // unchanged observation collapses
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
      .toDF()
  }

  case class FunnelState(depth: Int, last: Long, t0: Long)
  case class FunnelUpdate(key: Long, funnel_depth: Int)

  def funnelStream(
      stream: DataFrame,
      tsCol: String,
      typeCol: String,
      keyCol: String,
      steps: Seq[String],
      maxSpan: Option[Long] = None,
  ): DataFrame = {
    import stream.sparkSession.implicits._
    require(steps.nonEmpty, "empty funnel")
    stream
      .select(col(keyCol).cast("long").as("k"),
        col(tsCol).cast("long").as("ts"), col(typeCol).cast("string").as("t"))
      .filter(col("t").isin(steps: _*))
      // null key/ts would kill the live query (primitive tuple encoder)
      .filter(col("k").isNotNull && col("ts").isNotNull)
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelUpdate](
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
          var d = prev.depth; var last = prev.last; var t0 = prev.t0
          // sort mirrors the batch operator's array_sort struct(ts, t)
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, t) =>
            val inSpan = maxSpan.forall(s => d == 0 || ts - t0 <= s)
            if (d < steps.length && t == steps(d) &&
              (d == 0 || ts > last) && inSpan) {
              if (d == 0) t0 = ts
              d += 1
              last = ts
            }
          }
          state.update(FunnelState(d, last, t0))
          FunnelUpdate(key, d)
      }
      .toDF()
  }

  /** Streaming exact dedup: drop events whose fingerprint was already
    * seen within the watermark horizon — the incremental form of
    * [[graft.pipeline.Dedup.exactDuplicates]] for ingestion pipelines.
    * State is bounded by (distinct keys × watermark window); late
    * duplicates beyond the watermark are the documented trade-off.
    */
  def dedupWithinWatermark(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String,
  ): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming NEAR-duplicate suppression: key the watermarked dedup on
    * the MinHash signature instead of raw content, so documents whose
    * shingle sets minhash identically (near-certain duplicates at 32
    * hashes) collapse to the first arrival. A streaming-feasible
    * approximation of the batch pair-join (stream-stream self-joins on
    * band buckets would need both sides fully retained); the estimated-
    * Jaccard threshold dial is traded for signature equality.
    */
  def dedupNearWithinWatermark(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String,
      numHashes: Int = 32,
      shingleK: Int = 5,
  ): DataFrame =
    stream
      // Texts shorter than the shingle size (incl. null/empty) have an
      // empty shingle set and thus one shared all-null signature; keying
      // on it would collapse DISTINCT short documents into one arrival.
      // The batch path never pairs them (est. Jaccard 0), so fall back to
      // an exact content fingerprint for those rows (null keeps its own
      // key via the second element, so it cannot collide with real text).
      .withColumn("_sig",
        when(length(coalesce(col(textCol), lit(""))) >= shingleK,
          graft.pipeline.Dedup.minhashSignature(col(textCol),
            k = shingleK, numHashes = numHashes))
          .otherwise(array(
            xxhash64(coalesce(col(textCol), lit(""))),
            when(col(textCol).isNull, lit(1L)).otherwise(lit(0L)))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("_sig"))
      .drop("_sig")

  /** Stream-stream interval join (click attribution): pair each left
    * event with right events sharing its keys whose timestamp lands in
    * `[leftTs, leftTs + maxLag]`. Both sides carry event-time watermarks,
    * so Spark bounds the join state to `watermark + maxLag` of buffered
    * rows per side — the state-safe form of [[graft.dfops.DfOps.rangeJoin]]
    * for live pipelines. Column names must be disjoint across the sides
    * except for `joinKeys` (reference the output via the `l`/`r`
    * aliases). Inner by default; outer stream-stream joins emit their
    * null rows only once the watermark closes the window — semantics,
    * not a bug, but documented here because batch-parity tests must
    * wait for it.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      joinKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      maxLag: String,
      watermark: String,
      joinType: String = "inner",
  ): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).as("l")
    val r = right.withWatermark(rightTs, watermark).as("r")
    val keyCond = joinKeys.map(k => col(s"l.$k") === col(s"r.$k"))
    val timeCond =
      col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $maxLag")
    l.join(r, (keyCond :+ timeCond).reduce(_ && _), joinType)
  }

  /** Streaming gap-based sessionization: per-key session aggregates via
    * Spark's native `session_window` (sessions close when no event
    * arrives within `gap`; watermark bounds open-session state). The
    * incremental form of [[graft.dfops.DfOps.sessionize]] — the batch
    * operator numbers sessions, the stream emits each session's bounds
    * and size once it is final.
    */
  def sessionizeStream(
      stream: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      gap: String,
      watermark: String,
  ): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keyCols.map(col) :+
        col("session_window.start").as("session_start") :+
        col("session_window.end").as("session_end") :+
        col("n_events"): _*)

  /** Sink a streaming sparse histogram ([[windowedHistogram]] output) as
    * per-batch cube snapshots via the provided callback (e.g.
    * [[graft.export.CubeIO.writeDense]] keyed by batch id) — the
    * live-monitoring surface of the batch `compute()`.
    *
    * Runs in UPDATE mode: each micro-batch delivers only the window-cells
    * whose counts changed; they upsert (new totals replace old) into a
    * driver-side accumulator, and the cube summed across retained
    * windows is handed to `onBatch`. Complete mode would both re-emit
    * ALL history every batch and pin every window ever opened in the
    * state store (watermark eviction does not apply under Complete) —
    * unbounded on a long-running query. Update keeps the state store
    * watermark-bounded; the driver store is bounded by `retainWindows`
    * (most-recent window starts kept; the default 256 bounds a live
    * monitor, 0 = keep ALL windows — only safe for bounded
    * streams/tests). Driver memory is O(retained windows × filled
    * cells); the cube itself must fit the same densify cap as the
    * batch path.
    *
    * RESTART SEMANTICS: the accumulator is driver state while the query
    * itself checkpoints, and Update mode only re-delivers cells that
    * CHANGE post-restart. With `stateDir = None` snapshots are therefore
    * complete only within one query run. Pass a `stateDir` (a durable
    * directory, paired with the query's checkpoint) and the sink
    * persists the accumulator after every batch (atomic tmp+rename) and
    * seeds a fresh accumulator from it on the first post-restart batch —
    * snapshots then stay complete across restarts. Replayed batches
    * (crash between persist and checkpoint commit) are harmless: cell
    * upserts carry TOTALS, so re-applying a delta is idempotent. The
    * persisted file is the same bounded size as the accumulator.
    */
  def cubeSnapshotSink(
      binned: DataFrame,
      axes: Seq[graft.binning.BinAxis],
      onBatch: (graft.binning.BinnedCube, Long) => Unit,
      countName: String = "cnt",
      retainWindows: Int = 256,
      stateDir: Option[String] = None,
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val cells = axes.map(_.nBins.toLong).product
    require(cells <= 200L * 1000 * 1000,
      s"cubeSnapshotSink: $cells cells exceeds the densify cap")
    val shape = axes.map(_.nBins)
    val strides = new Array[Long](axes.length)
    var st = 1L
    for (i <- axes.indices.reverse) { strides(i) = st; st *= shape(i) }
    val acc = scala.collection.mutable.Map.empty[(Long, Seq[Long]), Long]
    var evictionWarned = false
    var restored = stateDir.isEmpty
    // captured at build time: foreachBatch bodies run on the driver, and
    // the state path goes through the Hadoop FS API so a cluster can
    // point it at the same durable FS as the checkpoint (hdfs://, s3a://)
    val hadoopConf = new org.apache.hadoop.conf.Configuration(
      binned.sparkSession.sparkContext.hadoopConfiguration)
    binned.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!restored) {
          restored = true
          stateDir.foreach(d => restoreAcc(d, shape, hadoopConf)
            .foreach { case (k, v) => acc(k) = v })
        }
        val rows = batch.select(
          col("window.start").cast("long") +:
            axes.map(ax => col(Binning.idxName(ax))) :+
            col(countName).cast("long"): _*).collect()
        rows.foreach { r =>
          val idxs = Seq.tabulate(axes.length)(i => r.getLong(i + 1))
          acc((r.getLong(0), idxs)) = r.getLong(axes.length + 1)
        }
        if (retainWindows > 0) {
          val starts = acc.keys.map(_._1).toSeq.distinct.sorted
          if (starts.length > retainWindows) {
            val keep = starts.takeRight(retainWindows).toSet
            if (!evictionWarned) {
              evictionWarned = true
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"cubeSnapshotSink: retainWindows=$retainWindows reached " +
                  s"at batch $id — evicting ${starts.length - retainWindows}" +
                  " oldest window(s) from snapshots from here on; pass " +
                  "retainWindows=0 to keep all windows (bounded streams " +
                  "only)")
            }
            acc.filterInPlace { case ((w, _), _) => keep(w) }
          }
        }
        stateDir.foreach(d => persistAcc(d, axes.length, acc, hadoopConf))
        val data = new Array[Long](cells.toInt)
        acc.foreach { case ((_, idxs), c) =>
          var flat = 0L
          var i = 0
          while (i < idxs.length) { flat += idxs(i) * strides(i); i += 1 }
          data(flat.toInt) += c
        }
        onBatch(graft.binning.BinnedCube(
          axes.map(_.column), axes.map(_.centers), data, shape), id)
      }
  }

  /** Durable accumulator file layout (`<stateDir>/acc.bin`): magic int,
    * version int, nAxes int, nEntries int, then per entry windowStart +
    * nAxes indices + count as big-endian longs. All IO goes through the
    * Hadoop `FileSystem` for the URI (local path, hdfs://, s3a:// — the
    * same durable FS the checkpoint lives on); the write lands on a
    * temp name and swaps in via `FileContext.rename(OVERWRITE)` (atomic
    * on HDFS and posix), so a crash mid-write leaves the previous
    * complete state.
    */
  private val AccMagic = 0x47525354 // "GRST"

  private def persistAcc(dir: String, nAxes: Int,
      acc: scala.collection.Map[(Long, Seq[Long]), Long],
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    fs.mkdirs(root)
    val qRoot = fs.makeQualified(root)
    val tmp = new org.apache.hadoop.fs.Path(qRoot, "acc.bin.tmp")
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(tmp, true)))
    try {
      out.writeInt(AccMagic); out.writeInt(1)
      out.writeInt(nAxes); out.writeInt(acc.size)
      acc.foreach { case ((w, idxs), c) =>
        out.writeLong(w)
        idxs.foreach(out.writeLong)
        out.writeLong(c)
      }
    } finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(qRoot.toUri, conf)
      .rename(tmp, new org.apache.hadoop.fs.Path(qRoot, "acc.bin"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Hostile-input posture (the TfRecord/WARC one): the entry count is
    * cross-checked against the ACTUAL file length before any entry is
    * read — a lying/truncated `nEntries` is a named error, not a raw
    * EOFException mid-stream or a giant allocation — and every restored
    * bin index is validated against the sink's axes SHAPE, because an
    * `acc.bin` from a different binning config (same axis count, more
    * bins) would otherwise crash the stream later with an unnamed
    * ArrayIndexOutOfBounds inside the densify loop.
    */
  private def restoreAcc(dir: String, shape: Seq[Int],
      conf: org.apache.hadoop.conf.Configuration)
      : Seq[((Long, Seq[Long]), Long)] = {
    val nAxes = shape.length
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val f = new org.apache.hadoop.fs.Path(root, "acc.bin")
    if (!fs.exists(f)) return Nil
    val fileLen = fs.getFileStatus(f).getLen
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      fs.open(f)))
    try {
      require(in.readInt() == AccMagic && in.readInt() == 1,
        s"$f: not a cubeSnapshotSink state file")
      val fileAxes = in.readInt()
      require(fileAxes == nAxes,
        s"$f: state has $fileAxes axes, sink expects $nAxes — stale dir?")
      val n = in.readInt()
      val want = 16L + n.toLong * 8L * (nAxes + 2)
      require(n >= 0 && fileLen == want,
        s"$f: claims $n entries (${want}B) but holds ${fileLen}B — " +
          "truncated or corrupt state")
      Seq.fill(n) {
        val w = in.readLong()
        val idxs = Seq.tabulate(nAxes) { i =>
          val idx = in.readLong()
          require(idx >= 0 && idx < shape(i),
            s"$f: bin index $idx out of range for axis $i " +
              s"(${shape(i)} bins) — state from a different binning config?")
          idx
        }
        val c = in.readLong()
        require(c >= 0, s"$f: negative count $c — corrupt state")
        ((w, idxs), c)
      }
    } finally in.close()
  }

  /** Per-micro-batch drift monitor: each batch's histogram over `ax` is
    * PSI-compared against the FIXED `baseline` frame
    * ([[graft.pipeline.Drift.psiReport]]) and handed to `onReport` with
    * the batch id — the live gate for "did the incoming shard shift
    * under the distribution we validated". The baseline side is
    * re-aggregated per batch; cache it (its histogram is ≤ nBins rows,
    * but the SCAN repeats) or pre-reduce it to a histogram frame when
    * batches are frequent.
    */
  def psiStream(
      stream: DataFrame,
      baseline: DataFrame,
      ax: graft.binning.UniformAxis,
      onReport: (Long, DataFrame) => Unit,
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onReport(id, graft.pipeline.Drift.psiReport(baseline, batch, ax))
      }

  /** Continuous index ingestion: each micro-batch of documents merges
    * into the on-disk [[graft.pipeline.TextIndex]] lake via
    * `foreachBatch` — postings append into their term buckets, vocab
    * and stats merge exactly as the batch [[graft.pipeline.TextIndex.merge]]
    * (it IS that merge), so after any number of micro-batches the index
    * equals a from-scratch build over everything ingested. The
    * disjoint-id contract is per-batch too: replayed batches would
    * double-count (exactly-once sinks need an idempotent id filter
    * upstream, e.g. [[graft.pipeline.Dedup]]'s bloom gate).
    */
  def indexStream(
      stream: DataFrame,
      textCol: String,
      idCol: String,
      dir: String,
  ): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.pipeline.TextIndex.merge(batch, textCol, idCol, dir): Unit
      }

  /** Convenience: run a streaming query over a bounded in-memory source to
    * completion and return the sink table (used by tests and batch-parity
    * checks).
    */
  def runToMemorySink(
      stream: DataFrame,
      queryName: String,
      outputMode: OutputMode,
  ): DataFrame = {
    val q = stream.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    stream.sparkSession.table(queryName)
  }
}

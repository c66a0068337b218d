package graft.dfops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level dataframe operations, the Spark re-expression of
  * `sed/core/dfops.py`. Every operator here is a lazy, embarrassingly
  * parallel projection or a single window/aggregate — no driver-side loops,
  * no UDFs in the hot path.
  */
object DfOps {

  /** Guard for operators that stage work through reserved temp columns:
    * `withColumn` silently REPLACES an existing column, so an input that
    * already carries one of these names would corrupt the result (or, in
    * [[asofJoin]], return the temp column's contents as user data)
    * instead of failing loudly.
    */
  private def requireFresh(df: DataFrame, names: String*): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"input already has reserved column(s) ${clash.mkString(", ")} — " +
        "rename them first")
  }

  /** T1 `apply_jitter` (`sed/core/dfops.py:16-70`): de-quantize digitized
    * columns with uniform `U(-amp, amp)` or normal `N(0, amp)` noise into
    * new `<col>_jittered` columns (or in place via `colsJittered`).
    *
    * Reference semantics: ONE noise vector is drawn per call and shared by
    * all target columns (correlated jitter); we reproduce that by deriving a
    * single `rand(seed)` column reused across targets. Seeded for test
    * reproducibility; the reference is unseeded (SURVEY.md §7.4 risk 4).
    */
  def applyJitter(
      df: DataFrame,
      cols: Seq[String],
      colsJittered: Option[Seq[String]] = None,
      amps: Seq[Double] = Seq(0.5),
      jitterType: String = "uniform",
      seed: Long = 42L,
  ): DataFrame = {
    require(
      jitterType == "uniform" || jitterType == "normal",
      "type needs to be one of 'normal', 'uniform'!",
    )
    val outNames = colsJittered.getOrElse(cols.map(_ + "_jittered"))
    require(outNames.length == cols.length)
    val ampSeq = if (amps.length == 1) Seq.fill(cols.length)(amps.head) else amps
    require(ampSeq.length == cols.length)
    requireFresh(df, "_jitter_noise")
    val noise =
      if (jitterType == "uniform") rand(seed) * 2.0 - 1.0 else randn(seed)
    val withNoise = df.withColumn("_jitter_noise", noise)
    val out = cols.lazyZip(outNames).lazyZip(ampSeq).foldLeft(withNoise) {
      case (d, (c, cj, amp)) =>
        d.withColumn(cj, col(c) + lit(amp) * col("_jitter_noise"))
    }
    out.drop("_jitter_noise")
  }

  /** P1 `apply_filter` (`sed/core/dfops.py:91-120`): open-interval range
    * predicate on one column. Bounds default to ±∞.
    */
  def applyFilter(
      df: DataFrame,
      column: String,
      lowerBound: Double = Double.NegativeInfinity,
      upperBound: Double = Double.PositiveInfinity,
  ): DataFrame =
    df.filter(col(column) > lit(lowerBound) && col(column) < lit(upperBound))

  /** P4 `drop_column` (`sed/core/dfops.py:73-88`). */
  def dropColumns(df: DataFrame, cols: String*): DataFrame = df.drop(cols: _*)

  /** T14 `map_columns_2d` (`sed/core/dfops.py:165-193`): arbitrary
    * 2-in/2-out column mapping, e.g. a rotation.
    */
  def mapColumns2D(
      df: DataFrame,
      xColumn: String,
      yColumn: String,
      mapping: (Column, Column) => (Column, Column),
      newXColumn: String,
      newYColumn: String,
  ): DataFrame = {
    val (nx, ny) = mapping(col(xColumn), col(yColumn))
    df.withColumns(Map(newXColumn -> nx, newYColumn -> ny))
  }

  /** T13 `offset_by_other_columns` (`sed/core/dfops.py:318-443`), the shared
    * engine behind energy/delay `add_offsets`:
    *
    * `target += Σ signᵢ · (colᵢ or mean(colᵢ))`, then `−Σ signᵢ · mean(colᵢ)`
    * for columns with `preserveMean`. `reduction = Some("mean")` uses the
    * column's global mean instead of the per-row value.
    *
    * The dask original needs three `map_partitions` passes plus delayed
    * scalars; here the means come from ONE aggregate job (only over the
    * columns that need them) and the shift is a single projection — two jobs
    * total regardless of column count, shuffle-free.
    */
  def offsetByOtherColumns(
      df: DataFrame,
      targetColumn: String,
      offsetColumns: Seq[String],
      weights: Seq[Double],
      preserveMean: Seq[Boolean] = Nil,
      reductions: Seq[Option[String]] = Nil,
      rename: Option[String] = None,
  ): DataFrame = {
    require(offsetColumns.nonEmpty, "no offset columns provided")
    require(offsetColumns.length == weights.length)
    val pm =
      if (preserveMean.isEmpty) Seq.fill(offsetColumns.length)(false)
      else preserveMean
    val red =
      if (reductions.isEmpty) Seq.fill(offsetColumns.length)(Option.empty[String])
      else reductions
    require(red.forall(r => r.isEmpty || r.contains("mean")),
      "only reduction='mean' is supported")
    val needMean =
      offsetColumns.lazyZip(red).lazyZip(pm).collect {
        case (c, r, p) if r.nonEmpty || p => c
      }.toSeq.distinct
    val means: Map[String, Double] =
      if (needMean.isEmpty) Map.empty
      else {
        val row = df.agg(avg(needMean.head), needMean.tail.map(avg(_)): _*).first()
        // an empty frame / all-null column has a null mean: propagate NaN
        // (numpy's mean-of-empty) instead of NPEing inside Row.getDouble
        needMean.zipWithIndex.map { case (c, i) =>
          c -> (if (row.isNullAt(i)) Double.NaN else row.getDouble(i))
        }.toMap
      }
    val target = rename.getOrElse(targetColumn)
    var shifted: Column = col(targetColumn)
    offsetColumns.lazyZip(weights).lazyZip(red).foreach { case (c, w, r) =>
      val term = if (r.contains("mean")) lit(means(c)) else col(c)
      shifted = shifted + lit(w) * term
    }
    offsetColumns.lazyZip(weights).lazyZip(pm).foreach { case (c, w, p) =>
      if (p) shifted = shifted - lit(w) * lit(means(c))
    }
    df.withColumn(target, shifted)
  }

  /** T16 `forward_fill_lazy` (`sed/core/dfops.py:196-315`): propagate the
    * last non-null value onto subsequent rows — used to paint per-train /
    * per-pulse channel values onto electrons.
    *
    * The dask original iterates `map_overlap` passes to cross fully-null
    * partitions; this is the same split-then-stitch idea expressed
    * exactly once. Requires a stable ordering column (file sequence +
    * row position, materialized at ingestion — SURVEY.md §7.4 risk 3).
    * With `partitionCols` (e.g. the file id) the fill is one keyed
    * window — use it whenever the fill cannot cross that boundary.
    *
    * The UNPARTITIONED (global) variant is TWO-PHASE since round 11: a
    * keyless `Window.orderBy` funnels the entire frame through ONE task
    * (the loader64 rehearsal measured the flash assemble path dying on
    * exactly that at ×64 — 6.5 M rows, one core). Instead the frame
    * range-partitions on `orderCol`, each partition fills locally in
    * parallel, every partition's LAST filled row (one row per
    * partition — bounded by `spark.sql.shuffle.partitions`) forms a
    * tiny carry table whose own keyless prefix-window is over ≤ a few
    * hundred rows, and the carries broadcast-join back to patch each
    * partition's leading nulls. Values are identical to the one-window
    * form for a unique `orderCol` (ties may land in either partition —
    * the same tie nondeterminism the keyless window had). Cost: the
    * within-fill subtree is evaluated twice (once for the carry rows);
    * at any size where that matters the single-task window was not an
    * option.
    *
    * `smallFrame = true` opts back into the one-window form for frames
    * the CALLER knows are small (a single file's materialization, a
    * bounded census table): same values, several fewer stages of
    * scheduler latency, one task. Never set it on data that grows with
    * the corpus.
    */
  def forwardFill(
      df: DataFrame,
      cols: Seq[String],
      orderCol: String,
      partitionCols: Seq[String] = Nil,
      smallFrame: Boolean = false,
  ): DataFrame = {
    if (partitionCols.nonEmpty) {
      val w = Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(col(orderCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    } else globalFill(df, cols, orderCol, backward = false, smallFrame)
  }

  /** `backward_fill_lazy` (`sed/core/dfops.py:260-315`): mirror of
    * [[forwardFill]] filling from the next non-null value (same
    * two-phase global form).
    */
  def backwardFill(
      df: DataFrame,
      cols: Seq[String],
      orderCol: String,
      partitionCols: Seq[String] = Nil,
      smallFrame: Boolean = false,
  ): DataFrame = {
    if (partitionCols.nonEmpty) {
      val w = Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(col(orderCol))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
    } else globalFill(df, cols, orderCol, backward = true, smallFrame)
  }

  /** Shared two-phase global fill (see [[forwardFill]]). `backward`
    * mirrors every direction: the local window fills from the following
    * rows, the carry row is each partition's FIRST filled row, and the
    * carry prefix-scan looks at following partitions.
    */
  private def globalFill(
      df: DataFrame,
      cols: Seq[String],
      orderCol: String,
      backward: Boolean,
      smallFrame: Boolean = false,
  ): DataFrame = {
    if (cols.isEmpty) return df // nothing to fill — the old form's no-op
    // `smallFrame` callers (e.g. a SINGLE-file loader materialization,
    // whose decode is one task anyway) take the one-window form: the
    // two-phase machinery buys parallelism the upstream can't feed and
    // costs several extra tiny stages of scheduler latency
    if (smallFrame) return singleWindowFill(df, cols, orderCol, backward)
    val spark = df.sparkSession
    val pid = "_gf_pid"
    val reserved = pid +: cols.map(c => s"_gf_c_$c")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"globalFill reserves ${clash.mkString(", ")} — rename the input column(s)")
    // CORRECTNESS INVARIANT: `ranged` is consumed by TWO plan branches
    // (the fill window and the carry aggregate), and RangePartitioner's
    // sample seed derives from the physical RDD id — the branches agree
    // on partition ids ONLY because Spark dedupes identical canonical
    // exchanges (spark.sql.exchange.reuse; both branches share this one
    // `ranged` object, so the canonical plans are equal by
    // construction, cached inputs included). If reuse is disabled, two
    // independently-sampled exchanges could draw different boundaries
    // and a boundary row would be patched with the wrong side's carry —
    // fall back to the single-window form (correct, the pre-round-11
    // plan) rather than risk silently wrong fills.
    if (!spark.conf.get("spark.sql.exchange.reuse", "true").toBoolean)
      return singleWindowFill(df, cols, orderCol, backward)
    val n = math.max(1,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn(pid, spark_partition_id())
    val local = Window.partitionBy(col(pid)).orderBy(col(orderCol))
    val localW =
      if (backward) local.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else local.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def fillOne(d: DataFrame, c: String): DataFrame =
      if (backward) d.withColumn(c, first(col(c), ignoreNulls = true).over(localW))
      else d.withColumn(c, last(col(c), ignoreNulls = true).over(localW))
    val within = cols.foldLeft(ranged)(fillOne)
    // one carry row per partition: the value at the greatest (smallest,
    // backward) orderCol among that column's NON-NULL rows — i.e. the
    // partition's last filled value, computed as a partial-aggregating
    // groupBy over the raw ranged frame (map-side combine; much cheaper
    // than a second full window subtree, which would also re-evaluate
    // the within-fill)
    def edgeVal(c: String): Column = {
      // the ordering key must rank a NULL orderCol the way the sort
      // does (nulls first) instead of letting max_by/min_by SKIP the
      // row — wrap it in a never-null struct whose leading flag orders
      // nulls below every real value; rows whose VALUE is null still
      // skip via the outer when (null key)
      val orderKey = struct(col(orderCol).isNotNull.as("_nn"),
        col(orderCol).as("_v"))
      val key = when(col(c).isNotNull, orderKey)
      (if (backward) min_by(col(c), key) else max_by(col(c), key)).as(c)
    }
    val carrySrc = ranged.groupBy(col(pid))
      .agg(edgeVal(cols.head), cols.tail.map(edgeVal): _*)
    // prefix-scan the carries: keyless window over ≤ n rows (tiny by
    // construction — this is the ONLY keyless window left in the fill)
    val scan0 = Window.orderBy(if (backward) col(pid).desc else col(pid))
    val scanW = scan0.rowsBetween(Window.unboundedPreceding, -1) // strictly before
    val carry = cols.foldLeft(carrySrc)((d, c) =>
      d.withColumn(s"_gf_c_$c",
        last(col(c), ignoreNulls = true).over(scanW)))
      .select(col(pid) +: cols.map(c => col(s"_gf_c_$c")): _*)
    val patched = within.join(broadcast(carry), Seq(pid), "left")
    cols.foldLeft(patched)((d, c) =>
      d.withColumn(c, coalesce(col(c), col(s"_gf_c_$c")))
        .drop(s"_gf_c_$c"))
      .drop(pid)
  }

  /** The pre-round-11 one-task global fill: a single keyless window.
    * Used when the caller declares the frame small ([[forwardFill]]'s
    * `smallFrame`) and as the correctness fallback when exchange reuse
    * is disabled (see [[globalFill]]'s invariant note).
    */
  private def singleWindowFill(
      df: DataFrame,
      cols: Seq[String],
      orderCol: String,
      backward: Boolean,
  ): DataFrame = {
    val w0 = Window.orderBy(col(orderCol))
    val w =
      if (backward) w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      (if (backward) first(col(c), ignoreNulls = true)
       else last(col(c), ignoreNulls = true)).over(w)))
  }

  /** As-of join: for every left row, attach `valueCols` from the latest
    * right row whose `rightOrder` ≤ the left row's `leftOrder` (within the
    * same `keyCols` group) — the time-series join Spark's relational
    * operators lack natively (the reference's channel alignment and
    * timestamped-data attachment are both special cases; see
    * `sed/core/dfops.py:123-162` for the interpolating variant T15).
    *
    * Spark-first formulation: instead of an inequality join (which Catalyst
    * would execute as a broadcast-nested-loop — quadratic at scale), tag and
    * UNION the two inputs, then a single `last(value, ignoreNulls)` running
    * window per key fills each left row from the most recent right row. One
    * shuffle on `keyCols` (or one global sort when keyless), O(n log n),
    * identical to how a 1000-executor job would want it planned. Right rows
    * at the exact same order value as a left row DO match (`<=`). All
    * `valueCols` are taken from the SAME matched right row (filled as one
    * struct in a single window pass), so a null in that row's value column
    * stays null — never silently replaced from an older row. Callers must
    * make the right side unique per `(keyCols, rightOrder)` (aggregate
    * first) — with duplicates the surviving row is tie-nondeterministic,
    * as in any as-of engine.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftOrder: String,
      rightOrder: String,
      keyCols: Seq[String],
      valueCols: Seq[String],
  ): DataFrame = {
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    requireFresh(left, "_ord", "_isLeft", "_vals")
    requireFresh(right, "_isLeft", "_vals")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(valueCols.contains),
      s"left already has ${valueCols.filter(leftCols.contains).mkString(",")}")
    // tag: right rows sort BEFORE left rows at an equal order value so an
    // exactly-simultaneous right row is visible to the left row (<= match)
    val l = left.withColumn("_ord", col(leftOrder))
      .withColumn("_isLeft", lit(1))
      .withColumns(valueCols.map(v => v -> lit(null).cast(
        right.schema(v).dataType)).toMap)
      .select((leftCols.map(col) ++ Seq(col("_ord"), col("_isLeft")) ++
        valueCols.map(col)): _*)
    val r = right.select(
      (keyCols.map(col) ++ Seq(col(rightOrder).as("_ord"),
        lit(0).as("_isLeft")) ++ valueCols.map(col)): _*)
      .withColumns(leftCols.filterNot(keyCols.contains).map(c =>
        c -> lit(null).cast(left.schema(c).dataType)).toMap)
      .select((leftCols.map(col) ++ Seq(col("_ord"), col("_isLeft")) ++
        valueCols.map(col)): _*)
    val base =
      if (keyCols.isEmpty) Window.orderBy(col("_ord"), col("_isLeft"))
      else Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col("_ord"), col("_isLeft"))
    val w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pack ALL value columns into one struct that is null on left rows, and
    // fill with a single last(ignoreNulls) pass: every left row then unpacks
    // values from ONE matched right row — a null field in that row stays
    // null instead of falling back to an older right row (ASOF semantics
    // for nullable value columns), and N value columns cost one window
    // function instead of N.
    val filled = l.unionByName(r)
      .withColumn("_vals", when(col("_isLeft") === 0,
        struct(valueCols.map(col): _*)))
      .withColumn("_vals", last(col("_vals"), ignoreNulls = true).over(w))
    filled.filter(col("_isLeft") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col("_vals").getField(v).as(v)): _*)
  }

  /** Range (interval) join: pair every left row whose `pointCol` falls in
    * `[startCol, endCol)` of a right-side interval — the other relational
    * operator Spark lacks natively (Catalyst plans a raw inequality join
    * as a broadcast-nested-loop: O(|L|·|R|)).
    *
    * Scalable formulation: quantize the point axis into fixed-width
    * buckets; each interval explodes to the buckets it overlaps, each
    * point maps to one bucket, and the pairing becomes a hash equi-join
    * on (bucket ∪ keyCols) + a residual interval filter. Join cost is
    * |pairs sharing a bucket| instead of |L|·|R|; `bucketWidth` should be
    * on the order of the typical interval length (each interval then
    * explodes to ~2 buckets). Degenerate giant intervals explode to many
    * buckets — split those upstream or use a coarser width.
    */
  def rangeJoin(
      left: DataFrame,
      pointCol: String,
      right: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Double,
      keyCols: Seq[String] = Nil,
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireFresh(left, "_bk")
    requireFresh(right, "_bk")
    val lb = left.withColumn("_bk",
      floor(col(pointCol) / lit(bucketWidth)).cast("long"))
    // Inverted intervals (end < start — corrupt rows) are dropped UP
    // FRONT: they can never match the residual [start, end) filter, but
    // sequence(hi, lo) would generate a DESCENDING array of |hi-lo|
    // buckets — one bad row with end ≈ -1e18 is an executor-killing
    // allocation. Empty intervals (end == start) match nothing either.
    val rb = right.filter(col(endCol) > col(startCol)).withColumn("_bk",
      // floor(end/w) over-covers by one bucket when end sits exactly on a
      // boundary (end is exclusive) — harmless: the residual filter drops
      // those candidates, and the alternative exact arithmetic costs a
      // modulo per interval for no asymptotic gain
      explode(sequence(
        floor(col(startCol) / lit(bucketWidth)).cast("long"),
        floor(col(endCol) / lit(bucketWidth)).cast("long"))))
    lb.join(rb, Seq("_bk") ++ keyCols)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bk")
  }

  /** Gap-based sessionization: assign each row a session ordinal per key —
    * a new session starts when the gap to the previous row (by `orderCol`,
    * within `keyCols`) exceeds `maxGap`. The canonical event-stream
    * operator for a training-data pipeline (and the batch mirror of
    * Structured Streaming's session windows).
    *
    * One window pass: `lag` → gap indicator → running `sum` — a single
    * shuffle on `keyCols`, no iteration.
    */
  def sessionize(
      df: DataFrame,
      orderCol: String,
      maxGap: Column,
      keyCols: Seq[String],
      sessionCol: String = "session_id",
  ): DataFrame = {
    val base =
      if (keyCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val newSession = when(
      col(orderCol) - lag(col(orderCol), 1).over(base) > maxGap, 1L)
      .otherwise(0L)
    df.withColumn(sessionCol,
      sum(newSession).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Ordered funnel depth per key (the product-analytics / event-flow
    * staple, ClickHouse `windowFunnel` semantics): the number of funnel
    * `steps` completed in order, where step i+1 must occur strictly
    * AFTER step i's completion time (equivalently: chained strict-min
    * times — a greedy scan of the ts-sorted events matches exactly that,
    * independent of tie order). `maxSpan` (same unit as `tsCol`) bounds
    * the whole funnel relative to the first step's time.
    *
    * Plan: events filtered to the step types (pushdown-friendly), ONE
    * shuffle on the key, per-key sorted array folded by a single
    * `aggregate` expression — no per-step join or shuffle chain. The
    * collected per-key array holds only step-typed events; for power
    * keys at 100 TB, pre-dedupe (key, type, ts) or sessionize first.
    */
  def funnelDepth(
      df: DataFrame,
      tsCol: String,
      typeCol: String,
      keyCols: Seq[String],
      steps: Seq[String],
      maxSpan: Option[Long] = None,
      depthCol: String = "funnel_depth",
  ): DataFrame = {
    require(steps.nonEmpty, "empty funnel")
    val stepsLit = lit(steps.toArray)
    val sorted = df.filter(col(typeCol).isin(steps: _*))
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(
        struct(col(tsCol).cast("long").as("ts"), col(typeCol).as("t")))).as("_evs"))
    val acc0 = struct(lit(0).as("d"), lit(0L).as("last"), lit(0L).as("t0"))
    val folded = aggregate(col("_evs"), acc0, (a, e) => {
      // clamp the lookup: at full depth the d < n conjunct already
      // blocks advancing, but ANSI element_at would error on n+1 if a
      // rewrite ever broke And's short-circuit
      val expect = element_at(stepsLit, least(a("d") + 1, lit(steps.length)))
      val inSpan = maxSpan.fold(lit(true))(s =>
        a("d") === 0 || e("ts") - a("t0") <= lit(s))
      val advance = a("d") < steps.length && e("t") === expect &&
        (a("d") === 0 || e("ts") > a("last")) && inSpan
      struct(
        when(advance, a("d") + 1).otherwise(a("d")).as("d"),
        when(advance, e("ts")).otherwise(a("last")).as("last"),
        when(advance && a("d") === 0, e("ts")).otherwise(a("t0")).as("t0"))
    })
    sorted.select(keyCols.map(col) :+ folded("d").as(depthCol): _*)
  }

  /** Funnel report: `(step, step_name, users)` with `users` = number of
    * keys reaching AT LEAST that step. The per-step totals are a handful
    * of rows — assembled driver-side from the depth histogram.
    */
  def funnelReport(
      df: DataFrame,
      tsCol: String,
      typeCol: String,
      keyCols: Seq[String],
      steps: Seq[String],
      maxSpan: Option[Long] = None,
  ): DataFrame = {
    val counts = funnelDepth(df, tsCol, typeCol, keyCols, steps, maxSpan)
      .groupBy("funnel_depth").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = steps.indices.map { i =>
      val atLeast = counts.filter(_._1 > i).values.sum
      (i + 1, steps(i), atLeast)
    }
    df.sparkSession.createDataFrame(rows).toDF("step", "step_name", "users")
  }

  /** Cohort retention over an event stream: keys are cohorted by the
    * period of their FIRST event, and each `(cohort, offset)` cell
    * counts the distinct keys active `offset` periods after their
    * cohort period — the other product-analytics staple next to
    * [[funnelDepth]].
    *
    * Plan: one `(key, period)` distinct + one per-key min, both keyed on
    * the same column (co-partitioned join, one logical shuffle family),
    * then a count per (cohort, offset) — shuffle cardinality is active
    * cells, never raw events. Periods use integral DIV on the long
    * timestamp (exact past 2^53, where floor-of-double drifts).
    */
  def retention(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      periodLength: Long,
  ): DataFrame = {
    require(periodLength > 0, "periodLength must be positive")
    val period = expr(s"CAST($tsCol AS BIGINT) DIV CAST($periodLength AS BIGINT)")
    val active = df.select(keyCols.map(col) :+ period.as("_p"): _*).distinct()
    val cohorts = active.groupBy(keyCols.map(col): _*)
      .agg(min(col("_p")).as("_cohort"))
    active.join(cohorts, keyCols)
      .groupBy(col("_cohort").as("cohort"), (col("_p") - col("_cohort")).as("offset"))
      .agg(count(lit(1)).as("users"))
      .select(col("cohort"), col("offset"), col("users"))
  }

  /** Grouped quantiles (linear interpolation, the `quantile_cont` /
    * numpy `percentile` definition) — the auto-ranging companion to
    * binning (`bin_dataframe` computes axis ranges from data when
    * unspecified, `sed/binning/utils.py`).
    *
    * `approx = false` (default): Spark's exact `percentile` aggregate —
    * the oracle-checkable contract, but it buffers every group value.
    * `approx = true`: `percentile_approx` (KLL-style mergeable sketch,
    * one pass, bounded memory) — the 100 TB path; `accuracy` trades
    * memory for rank error ≤ `1/accuracy` (property-tested bound).
    */
  def groupQuantiles(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      quantiles: Seq[(String, Double)],
      approx: Boolean = false,
      accuracy: Int = 10000,
  ): DataFrame = {
    val aggs = quantiles.map { case (name, q) =>
      val agg =
        if (approx) percentile_approx(col(valueCol), lit(q), lit(accuracy))
        else percentile(col(valueCol), lit(q))
      round(agg, 6).as(name)
    }
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Grouped distinct cardinality. `approx = true` swaps the exact
    * `count_distinct` (full shuffle of the distinct pairs) for
    * HyperLogLog++ (`approx_count_distinct`, mergeable sketch, relative
    * error ≤ `rsd`) — the 100 TB path for high-cardinality keys.
    */
  def groupCardinality(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      outCol: String = "cardinality",
      approx: Boolean = false,
      rsd: Double = 0.05,
  ): DataFrame = {
    val agg =
      if (approx) approx_count_distinct(col(valueCol), rsd)
      else countDistinct(col(valueCol))
    df.groupBy(keyCols.map(col): _*).agg(agg.as(outCol))
  }

  /** T7 `split_channel_bitwise` (`sed/loader/utils.py:99-197`): split an
    * integer channel into its `bits` LSBs and the remaining high bits — the
    * detector packs a 3-bit sector ID into the TOF LSBs.
    */
  def splitChannelBitwise(
      df: DataFrame,
      column: String,
      lowColumn: String,
      highColumn: String,
      bits: Int,
  ): DataFrame =
    df.withColumns(Map(
      lowColumn -> col(column).bitwiseAND(lit((1L << bits) - 1)),
      highColumn -> shiftright(col(column), bits),
    ))

  /** Skew-safe two-phase aggregation: when a grouping key is heavily
    * skewed (one detector region, one dominant document source), a plain
    * `groupBy(key)` funnels the hot key through one reducer. Salting
    * splits each key into `saltBuckets` sub-keys for the partial phase and
    * re-aggregates the partials — both phases map-side combinable, hot-key
    * reducer load divided by `saltBuckets`.
    *
    * `aggs` supplies per output column a (name, partial aggregate
    * expression, partial-merge function), e.g. `("cnt", count(lit(1)),
    * sum)` for a count or `("total", sum(col("x")), sum)` for a sum.
    * (AQE's skew handling covers joins; aggregation skew needs the salt.)
    */
  def saltedAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      aggs: Seq[(String, Column, Column => Column)],
      saltBuckets: Int = 16,
      seed: Long = 7L,
  ): DataFrame = {
    requireFresh(df, "_salt")
    val salted = df.withColumn("_salt",
      (rand(seed) * saltBuckets).cast("int"))
    val partial = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map(a => a._2.as(a._1)): _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head._3(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map(a => a._3(col(a._1)).as(a._1)): _*)
  }

  /** Per-group z-score standardization: `z = (x − mean) / stddev_pop`,
    * computed from explicit first/second moments (`Σx`, `Σx²`) in ONE
    * window pass per key — the formulation that stays a single shuffle on
    * the group key and, on integer-valued inputs, is bit-reproducible
    * across engines (both sums are exact in double, unlike streaming
    * Welford updates whose association varies). Groups with zero variance
    * yield null. The at-scale feature-normalization pass for training
    * pipelines; keyed, so it parallelizes across groups.
    */
  def zscoreNormalize(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      outCol: String = "z",
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
    val x = col(valueCol).cast("double")
    val n = count(x).over(w).cast("double")
    val mean = sum(x).over(w) / n
    val variance = sum(x * x).over(w) / n - mean * mean
    df.withColumn(outCol,
      round(when(variance > 0.0, (x - mean) / sqrt(variance)), 6))
  }

  /** First-order event-transition matrix (the Markov-chain / clickstream
    * census): per key, consecutive `(from → to)` event pairs in time
    * order, aggregated to counts plus the per-source-state transition
    * probability. `tiebreak` must complete a total order within a key so
    * simultaneous events pair deterministically.
    *
    * Plan shape: ONE key-window shuffle pairs the events (`lead`, no
    * self-join), one aggregation reduces pairs to the `|types|²`-bounded
    * matrix, and the probability normalizer is a window over THAT tiny
    * grouped result — the corpus is scanned once and never joined to
    * itself.
    */
  def transitionMatrix(
      df: DataFrame,
      tsCol: String,
      typeCol: String,
      keyCols: Seq[String],
      tiebreak: Seq[Column] = Nil,
  ): DataFrame = {
    requireFresh(df, "_to")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol) +: tiebreak: _*)
    val pairs = df
      .withColumn("_to", lead(col(typeCol), 1).over(w))
      .filter(col("_to").isNotNull)
    pairs
      .groupBy(col(typeCol).as("from_type"), col("_to").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prob",
        round(col("cnt").cast("double") /
          sum(col("cnt")).over(Window.partitionBy(col("from_type"))), 6))
  }

  /** Robust (median/MAD) outlier scoring per key: the modified z-score
    * `|x − median| / MAD` with a flag at `cutoff` (3.5 is the classic
    * Iglewicz–Hoaglin default, sans the 0.6745 normal-consistency factor
    * — documented divergence: we score in raw MAD units). The
    * heavy-tail-safe companion to [[zscoreNormalize]] for quality-signal
    * outlier sweeps, where means/variances are themselves dragged by the
    * outliers being hunted.
    *
    * Plan shape: both medians are exact `percentile` aggregates evaluated
    * as windows over the SAME `keyCols` partitioning — Catalyst plans two
    * Window operators above ONE exchange, so the corpus shuffles once and
    * is never joined back to itself. Score and flag are computed on the
    * ROUNDED score so threshold comparisons are reproducible across
    * engines. A zero-MAD group (> 50 % of values identical) yields null
    * score/flag rather than an ANSI divide-by-zero. At 100 TB swap the
    * exact `percentile` for `percentile_approx` (mergeable KLL sketch)
    * — same shape, bounded state.
    */
  def robustOutliers(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      cutoff: Double = 3.5,
      scoreCol: String = "mad_z",
      flagCol: String = "is_outlier",
  ): DataFrame = {
    requireFresh(df, "_dev", "_mad")
    val w =
      if (keyCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(keyCols.map(col): _*)
    val x = col(valueCol).cast("double")
    val dev = abs(x - percentile(x, lit(0.5)).over(w))
    df.withColumn("_dev", dev)
      .withColumn("_mad", percentile(col("_dev"), lit(0.5)).over(w))
      .withColumn(scoreCol,
        when(col("_mad") > 0.0, round(col("_dev") / col("_mad"), 6)))
      .withColumn(flagCol, col(scoreCol) > lit(cutoff))
      .drop("_dev", "_mad")
  }

  /** Rolling (trailing-window) mean per key: `avg(x)` over the
    * `nPreceding` previous rows plus the current one, in `orderCol` order.
    * One window shuffle keyed on `keyCols`; the frame is row-bounded so
    * executors never buffer more than the frame. The smoothing companion
    * to the reference's driver-side savgol (`sed/calibrator/energy.py:
    * 1785-1823`) when the series lives in the events table itself.
    */
  def rollingMean(
      df: DataFrame,
      valueCol: String,
      orderCol: String,
      keyCols: Seq[String],
      nPreceding: Int,
      outCol: String = "rolling_mean",
  ): DataFrame = {
    val base =
      if (keyCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val w = base.rowsBetween(-nPreceding, Window.currentRow)
    df.withColumn(outCol, avg(col(valueCol)).over(w))
  }

  /** Deterministic top-k per group by arbitrary ordering columns (e.g.
    * highest-quality documents per domain). One window shuffle on the
    * group key; always pass a total order (value desc + id tiebreak) so
    * re-runs select identical rows. The descending complement of
    * [[graft.pipeline.Sampling.capPerGroup]].
    */
  def topKPerGroup(
      df: DataFrame,
      keyCols: Seq[String],
      ordering: Seq[Column],
      k: Int,
  ): DataFrame = {
    requireFresh(df, "_rn")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Equi-depth (quantile) binning per key: `ntile(n)` in `(value,
    * tiebreak)` order — every bin gets the same row count, the standard
    * histogram-equalization companion to the uniform-width binning engine.
    * Keyed so the window parallelizes across groups; for a single global
    * key at 100 TB swap to `percentile_approx` cut points +
    * [[graft.binning.Binning.edgesBinIndex]] (one pass, no global sort).
    */
  def equiDepthBins(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      numBins: Int,
      tiebreak: Seq[Column],
      outCol: String = "bin",
  ): DataFrame = {
    val base =
      if (keyCols.isEmpty) Window.orderBy(col(valueCol) +: tiebreak: _*)
      else Window.partitionBy(keyCols.map(col): _*)
        .orderBy(col(valueCol) +: tiebreak: _*)
    df.withColumn(outCol, ntile(numBins).over(base).cast("long"))
  }

  /** T15 `add_time_stamped_data` (`sed/core/dfops.py:123-162`): linear
    * interpolation of an external `(timestamps, values)` series onto each
    * event's timestamp — `np.interp` semantics (clamped to the end values
    * outside the knot range).
    *
    * The knots are plan-time literals, so the binary search + lerp unrolls
    * into a balanced codegen'd CASE tree ([[Interp.piecewiseLinear]]);
    * no UDF, no broadcast join. For series too large to inline, the as-of
    * range-join formulation is the fallback.
    */
  def addTimeStampedData(
      df: DataFrame,
      destColumn: String,
      tsColumn: String,
      timestamps: Array[Double],
      values: Array[Double],
  ): DataFrame =
    df.withColumn(
      destColumn,
      Interp.piecewiseLinear(col(tsColumn), timestamps, values),
    )

  /** Long-format column profile: one row per column with row/null/distinct
    * counts and the min/max rendered as strings — the data-quality summary
    * a lake catalog keeps per table.
    *
    * Plan shape: ONE aggregation job over a single scan — every
    * per-column statistic is an agg expression of the same pass
    * (`count_distinct` expands to one Expand, so the exchange carries
    * per-column distinct streams, not one job per column), then the
    * |cols|-row result pivots to long format driver-free via stack.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
      )
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__rows_$c`, `__nulls_$c`, `__distinct_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) as " +
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)")
  }

  /** Resample an irregular series to a fixed grid with last-observation-
    * carried-forward fill: per key, grid points every `stepOrd` units
    * from the key's first to last observation (inclusive-aligned), each
    * carrying the latest value at-or-before it (`v`). Duplicate
    * observations at one (key, order) collapse deterministically to the
    * `tieCol`-max row first — both the grid and any SQL mirror would
    * otherwise pick an arbitrary one.
    *
    * Scale design: the grid EXPLODES from per-key bounds (one small agg
    * + `sequence`), never a driver loop; the fill is [[asofJoin]]'s
    * union-plus-one-window pass — a single shuffle on the key, no
    * inequality join. Output size is the inherent grid cardinality
    * (span/step per key); choose `stepOrd` accordingly.
    */
  def resampleSeries(df: DataFrame, ordCol: String, valueCol: String,
      tieCol: String, keyCols: Seq[String], stepOrd: Long): DataFrame = {
    require(stepOrd > 0, "stepOrd must be positive")
    val k = keyCols.map(col)
    val obs = df.groupBy((keyCols :+ ordCol).map(col): _*)
      .agg(max_by(col(valueCol), col(tieCol)).as("v"))
    val bounds = df.groupBy(k: _*)
      .agg(min(col(ordCol)).as("__mn"), max(col(ordCol)).as("__mx"))
    val grid = bounds.select((k :+
      explode(sequence(col("__mn"), col("__mx"), lit(stepOrd))).as("grid_ts")): _*)
    asofJoin(grid, obs, "grid_ts", ordCol, keyCols, Seq("v"))
  }
}

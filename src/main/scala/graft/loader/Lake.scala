package graft.loader

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-layout utilities for 100 TB deployments: pre-bucketed tables make
  * repeated equi-joins and aggregations on the bucket key exchange-free —
  * both sides arrive hash-partitioned on disk, so Catalyst plans a
  * sort-merge join with NO shuffle stage.
  *
  * The flash-style ingestion (ChannelLoader.bufferToParquet) is the write
  * path that should use this: buffer files bucketed by `trainId` make the
  * channel full-outer joins and all downstream per-train work co-located.
  */
object Lake {

  /** Write `df` as a bucketed (and optionally sorted) managed table,
    * replacing any existing table of that name (and its orphaned
    * warehouse location, which a crashed prior session can leave behind).
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
  ): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    // orphan-location cleanup through the CATALOG's own path resolution +
    // the Hadoop FS layer: a java.io.File on the warehouse URI's path
    // would silently no-op on hdfs://'/s3a:// warehouses, miss the
    // lowercased table dir and db-qualified names (db.tbl lives under
    // db.db/tbl), and in the worst case delete an unrelated LOCAL
    // directory that happens to share the path
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // loud on failure (same silent-false class as the TfRecord/CopyTool
    // stale deletes): a surviving orphan location under a re-created
    // table would surface as duplicate or mixed buckets
    if (fs.exists(loc) && !fs.delete(loc, true))
      throw new java.io.IOException(
        s"bucketed write: could not remove orphan table location $loc")
    val w = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.saveAsTable(tableName)
  }

  def readTable(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** Morton (Z-order) code of already-binned non-negative integer columns:
    * bit `j` of column `c` lands at position `j * nCols + c`, so the
    * curve alternates dimensions bit by bit. All terms are disjoint
    * single bits, OR-folded — one codegen'd projection, no UDF.
    *
    * Callers bin/scale columns first (e.g. [[writeZOrdered]]'s min-max
    * scaling, or any rank/uniform binning); `nCols * bitsPerCol` must fit
    * a positive Long.
    */
  def zValue(cols: Seq[Column], bitsPerCol: Int): Column = {
    val n = cols.size
    require(n > 0 && bitsPerCol > 0 && n * bitsPerCol <= 62,
      s"zValue: $n cols x $bitsPerCol bits exceeds 62 bits")
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      j <- 0 until bitsPerCol
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)),
      j * n + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` as parquet laid out along the Z-order curve of `zCols`:
    * each column is min-max scaled to `bitsPerCol` bits (one tiny agg
    * job), rows are range-partitioned by the interleaved [[zValue]] into
    * `numFiles` output files and sorted within each, then the helper
    * column is dropped before writing.
    *
    * Why this matters at 100 TB: parquet keeps per-file and per-row-group
    * min/max stats for every column, and the scan skips units whose
    * stats exclude the predicate. A single-column sort makes only that
    * column's ranges narrow per file; the Z-curve keeps EVERY zCol's
    * range narrow simultaneously, so multi-dimensional box predicates
    * (and single-column predicates on any of the zCols) prune files
    * without reading them. This is the same layout trick Delta/Iceberg
    * expose as `OPTIMIZE ZORDER BY`.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      bitsPerCol: Int = 16,
      numFiles: Int = 64,
  ): Unit = {
    val statsRow = df.agg(
      array(zCols.map(c => min(col(c)).cast("double")): _*).as("lo"),
      array(zCols.map(c => max(col(c)).cast("double")): _*).as("hi"),
    ).head()
    // loud guard: an empty frame (or an all-null zCol) yields null
    // min/max, which would otherwise surface as an opaque NPE inside
    // the scaling arithmetic
    val loRaw = statsRow.getSeq[Any](0)
    val hiRaw = statsRow.getSeq[Any](1)
    zCols.zipWithIndex.foreach { case (c, i) =>
      require(loRaw(i) != null && hiRaw(i) != null,
        s"writeZOrdered: column $c has no non-null values (empty input?)")
    }
    val lo = loRaw.map(_.asInstanceOf[Double])
    val hi = hiRaw.map(_.asInstanceOf[Double])
    val levels = (1L << bitsPerCol).toDouble
    val binned = zCols.zipWithIndex.map { case (c, i) =>
      val span = math.max(hi(i) - lo(i), java.lang.Double.MIN_NORMAL)
      least(floor((col(c).cast("double") - lit(lo(i))) / lit(span) * lit(levels)),
        lit(levels - 1)).cast("long")
    }
    df.withColumn("_graft_z", zValue(binned, bitsPerCol))
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode("overwrite").parquet(path)
  }

  /** True iff the (AQE-finalized) executed plan of `df` contains a
    * shuffle exchange — the assertion hook for "this join is co-located".
    * Execute an action on `df` first so adaptive planning has finalized.
    */
  def hasExchange(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // an EXECUTED AQE plan replaces materialized exchanges with
    // ShuffleQueryStageExec LEAVES (the exchange hangs off the stage's
    // `plan` member, not the tree) — a plain exists over children would
    // return a false NEGATIVE on exactly the executed plans the scaladoc
    // asks callers to probe, passing the "co-located" assertion vacuously
    def walk(p: SparkPlan): Boolean = p match {
      case _: ShuffleExchangeLike => true
      case _: ShuffleQueryStageExec => true
      case q: QueryStageExec => walk(q.plan)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other.children.exists(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  // ---- small-file compaction (the OPTIMIZE half of lake maintenance) ----

  /** First-fit-decreasing bin packing of `(file, bytes)` into rewrite
    * groups of ≤ `targetBytes` each. Files already at/above target stay
    * as singletons (no rewrite value). Driver-side over the file
    * LISTING — bounded by file count, never data size.
    */
  def compactionPlan(files: Seq[(String, Long)],
      targetBytes: Long): Seq[Seq[String]] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val (big, small) = files.partition(_._2 >= targetBytes)
    val groups = scala.collection.mutable.ArrayBuffer[
      (scala.collection.mutable.ArrayBuffer[String], Long)]()
    small.sortBy(-_._2).foreach { case (f, sz) =>
      groups.indexWhere(_._2 + sz <= targetBytes) match {
        case -1 =>
          groups += ((scala.collection.mutable.ArrayBuffer(f), sz))
        case i =>
          val (fs, tot) = groups(i)
          fs += f
          groups(i) = (fs, tot + sz)
      }
    }
    big.map(b => Seq(b._1)) ++ groups.map(_._1.toSeq)
  }

  /** Copy-compact a parquet directory into `outPath`: each multi-file
    * group is read and rewritten as ONE file (a per-group coalesce(1)
    * job — group size is capped at targetBytes, so the single task is
    * bounded); singleton groups copy through byte-for-byte (no decode,
    * no re-encode, preserving their stats). Row content is preserved;
    * file-level ordering within a group is not guaranteed (parquet has
    * no inter-file order contract).
    *
    * Listing goes through the Hadoop `FileSystem` API so HDFS/S3 paths
    * work (a `java.io.File` listing silently finds ZERO files on any
    * non-local scheme and would report success over a no-op). An empty
    * input and a non-empty `outPath` both fail loudly: the write is
    * `append`-mode per group, so a partial rerun into a pre-populated
    * directory would duplicate rows with no warning otherwise.
    */
  def compact(spark: SparkSession, path: String, outPath: String,
      targetBytes: Long): Int = {
    import org.apache.hadoop.fs.{FileUtil, Path => HPath}
    val hconf = spark.sparkContext.hadoopConfiguration
    val in = new HPath(path)
    val fs = in.getFileSystem(hconf)
    require(fs.exists(in), s"compact: input path $path does not exist")
    val entries = fs.listStatus(in)
    // a MIXED layout (top-level files + partition subdirs) would compact
    // only the top level and report success over silent row loss — fail
    // loudly and point at the per-leaf workflow (the fully-partitioned
    // case already fails via the nonEmpty require). Hidden entries
    // (_SUCCESS, _temporary, .crc) are not data.
    val dataDirs = entries.filter(st => st.isDirectory &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    require(dataDirs.isEmpty,
      s"compact: $path contains subdirectories " +
        s"(${dataDirs.take(3).map(_.getPath.getName).mkString(", ")}…) — " +
        "partitioned layout? compact each leaf directory instead")
    val files = entries
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.toString -> st.getLen).toSeq
    require(files.nonEmpty,
      s"compact: no parquet files under $path — refusing a silent no-op")
    val plan = compactionPlan(files, targetBytes)
    val out = new HPath(outPath)
    val outFs = out.getFileSystem(hconf)
    require(!outFs.exists(out) || outFs.listStatus(out).isEmpty,
      s"compact: $outPath is not empty — an append there would duplicate rows; " +
        "write to a fresh directory and move atomically")
    outFs.mkdirs(out)
    // singleton (already-at-target) files copy byte-for-byte as
    // DISTRIBUTED tasks: FileUtil.copy on the driver would stream every
    // multi-GB file through one machine sequentially — on an object
    // store that turns a metadata-shaped maintenance pass into hours of
    // driver-bound IO (the same distribution posture as CopyTool)
    val singles = plan.zipWithIndex.collect {
      // Locale.ROOT zero digit: file names are protocol, see TfRecord
      case (g, i) if g.size == 1 => (g.head, String.format(
        java.util.Locale.ROOT, "part-copy-%05d.parquet", Integer.valueOf(i)))
    }
    if (singles.nonEmpty) {
      val confBox = spark.sparkContext.broadcast(
        org.apache.spark.GraftSparkBridge.hadoopConfBox(spark.sparkContext))
      val outStr = out.toString
      spark.sparkContext
        .parallelize(singles, math.min(singles.size,
          spark.sparkContext.defaultParallelism))
        .foreach { case (src, name) =>
          val c = confBox.value.value
          val sp = new HPath(src)
          val dfs = new HPath(outStr).getFileSystem(c)
          // attempt-keyed tmp + idempotent rename (the TfRecord/CopyTool
          // commit posture): speculative twins never interleave writes
          // into one final file, and a crashed attempt leaves only litter
          val tc = org.apache.spark.TaskContext.get()
          val attempt = if (tc == null) 0L else tc.taskAttemptId()
          val fin = new HPath(outStr, name)
          val tmp = new HPath(outStr, s"._tmp.$name.$attempt")
          FileUtil.copy(sp.getFileSystem(c), sp, dfs, tmp,
            /* deleteSource = */ false, c)
          if (!dfs.rename(tmp, fin)) {
            if (dfs.exists(fin)) dfs.delete(tmp, false)
            else throw new java.io.IOException(s"compact: could not commit $fin")
          }
        }
      // sweep litter from killed attempts before the group rewrites land
      outFs.listStatus(out).foreach { st =>
        if (st.isFile && st.getPath.getName.startsWith("._tmp."))
          outFs.delete(st.getPath, false)
      }
    }
    plan.foreach { group =>
      if (group.size > 1)
        spark.read.parquet(group: _*).coalesce(1)
          .write.mode("append").parquet(outPath)
    }
    plan.size
  }
}

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
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, tableName)
    if (loc.exists())
      scala.reflect.io.Directory(loc).deleteRecursively()
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
    val lo = statsRow.getSeq[Double](0)
    val hi = statsRow.getSeq[Double](1)
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
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    root.exists {
      case _: ShuffleExchangeLike => true
      case a: AdaptiveSparkPlanExec => // reused subquery stages
        a.executedPlan.exists(_.isInstanceOf[ShuffleExchangeLike])
      case _ => false
    }
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
    val files = fs.listStatus(in)
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
    var written = 0
    plan.foreach { group =>
      if (group.size == 1) {
        FileUtil.copy(fs, new HPath(group.head), outFs,
          new HPath(out, f"part-copy-$written%05d.parquet"),
          /* deleteSource = */ false, hconf)
      } else {
        spark.read.parquet(group: _*).coalesce(1)
          .write.mode("append").parquet(outPath)
      }
      written += 1
    }
    plan.size
  }
}

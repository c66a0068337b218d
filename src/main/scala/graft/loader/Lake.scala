package graft.loader

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}

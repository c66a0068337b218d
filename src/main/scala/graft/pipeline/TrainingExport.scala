package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized training-shard export: the last step of a data pipeline,
  * turning a filtered/deduped corpus into the at-rest layout a trainer
  * streams — documents assigned to fixed token-budget packs
  * ([[TextOps.packSequences]]) and written as parquet partitioned by the
  * pack hash group, each file sorted by `(pack_id, pack_offset)` so one
  * sequential read of a group yields its packs contiguously.
  */
object TrainingExport {

  /** Write `df` as training shards under `dir` (one
    * `pack_group=<g>` parquet directory per hash group).
    *
    * Plan shape at scale: the text rides packSequences' single
    * `pack_group` window exchange (`carryCols` — no corpus self-join),
    * the writer inherits that partitioning (rows for a group land in one
    * task, no second shuffle), and `sortWithinPartitions` gives the
    * trainer's sequential-read order. `numGroups` bounds task size:
    * pick ≈ corpusTokens / (executorMemory-sized group).
    */
  def writeTokenShards(
      df: DataFrame,
      textCol: String,
      idCol: String,
      dir: String,
      budget: Long,
      numGroups: Int,
  ): Unit =
    TextOps.packSequences(df, textCol, idCol, budget, numGroups,
      carryCols = Seq(textCol))
      .sortWithinPartitions(col("pack_group"), col("pack_id"),
        col("pack_offset"))
      .write.mode("overwrite").partitionBy("pack_group").parquet(dir)

  /** Read shards back with the partition column restored to its long
    * type (parquet partition values parse as strings by default unless
    * type inference is on — normalize so round-trips are schema-stable).
    */
  def readTokenShards(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
  ): DataFrame = {
    val df = spark.read.parquet(dir)
    df.withColumn("pack_group", col("pack_group").cast("long"))
  }
}

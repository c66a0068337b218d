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

  /** [[writeTokenShards]] in TFRecord form — the layout a TF/JAX input
    * pipeline streams directly: packs become `tf.train.Example` records
    * (`doc_id`/`pack_group`/`pack_id`/`pack_offset`/`n_tokens` Int64
    * features + the text as a BytesList), pack groups HASHED onto at
    * most `numGroups` `.tfrecord[.gz]` shards (a shard may hold several
    * whole groups — hash collisions coalesce, never split), records
    * grouped by `pack_group` in `(pack_id, pack_offset)` trainer read
    * order within each shard. Same single pack_group exchange as the
    * parquet form (the explicit repartition aligns shards with groups;
    * the sort is within partitions only). Returns the record count.
    */
  def writeTokenShardsTfRecord(
      df: DataFrame,
      textCol: String,
      idCol: String,
      dir: String,
      budget: Long,
      numGroups: Int,
      compression: String = "",
  ): Long = {
    val packed = TextOps.packSequences(df, textCol, idCol, budget, numGroups,
      carryCols = Seq(textCol))
      .repartition(numGroups, col("pack_group"))
      .sortWithinPartitions(col("pack_group"), col("pack_id"),
        col("pack_offset"))
    TfRecord.writeExamples(packed, dir,
      Seq(idCol, textCol, "pack_group", "pack_id", "pack_offset", "n_tokens"),
      compression)
  }

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

  /** Write the corpus as JSONL shards — the lingua-franca interchange
    * format of LLM data tooling (one JSON object per line; any loader
    * can stream it). The corpus is hash-repartitioned on `idCol` into
    * exactly `numShards` writer tasks, one (optionally gzipped) part
    * file each — size shards so a file is a convenient dataloader unit
    * (hundreds of MB), not thousands of tiny files. The JSON encode is
    * a map-only pass; the explicit repartition is the only exchange.
    */
  def writeJsonl(
      df: DataFrame,
      idCol: String,
      dir: String,
      numShards: Int,
      compress: Boolean = true,
  ): Unit = {
    require(numShards > 0, s"numShards=$numShards")
    val w = df.repartition(numShards, col(idCol)).write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(dir)
  }

  /** Read JSONL shards. Pass the schema whenever it is known: without
    * it, Spark runs a full inference pass over every file before the
    * real scan — at 100 TB that is a second read of the corpus.
    */
  def readJsonl(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
  ): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(dir)
  }
}

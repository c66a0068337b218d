package graft.dfops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured (JSON) column processing — the event-properties /
  * API-payload side of an analytics engine. Mirrors the capability the
  * reference exposes through pandas/dask `json_normalize`-style metadata
  * handling (ref: sed/loader/mpes/loader.py metadata collection and
  * sed/core/metadata.py dict plumbing), re-expressed Spark-first.
  *
  * Scale design: extraction is `get_json_object` / `from_json` — both
  * codegen'd Catalyst expressions evaluated inline in the scan's
  * projection (no UDF, no shuffle). Schema inference — the only part
  * that cannot be a per-row expression — runs on a BOUNDED deterministic
  * sample pulled once, then the inferred schema is applied corpus-wide
  * as an explicit `from_json` schema: at 100 TB the inference cost is
  * constant, never a second corpus scan.
  */
object SemiStructured {

  /** One JSON field as a typed column: `get_json_object` (codegen'd,
    * returns string) cast to `dt`. Malformed JSON / missing path → null,
    * never a task failure.
    */
  def jsonField(jsonCol: Column, path: String, dt: DataType): Column =
    get_json_object(jsonCol, path).cast(dt)

  /** Append typed columns extracted from a JSON string column:
    * `fields` maps output column name → (JSONPath, type). Pure
    * projection — pushdown-friendly, map-only.
    */
  def extractJson(df: DataFrame, jsonCol: String,
      fields: Map[String, (String, DataType)]): DataFrame =
    fields.foldLeft(df) { case (d, (name, (path, dt))) =>
      d.withColumn(name, jsonField(col(jsonCol), path, dt))
    }

  /** Parse a JSON string column against an EXPLICIT schema and flatten
    * the top-level struct fields into `prefix`-named columns. PERMISSIVE:
    * malformed rows yield null fields. One `from_json` evaluation per
    * row (the struct is bound once, not once per field).
    */
  def flattenJson(df: DataFrame, jsonCol: String, schema: StructType,
      prefix: String = ""): DataFrame = {
    val parsed = df.withColumn("__j", from_json(col(jsonCol), schema))
    schema.fields.foldLeft(parsed) { (d, f) =>
      d.withColumn(prefix + f.name, col("__j").getField(f.name))
    }.drop("__j")
  }

  /** Infer a JSON schema from a bounded deterministic sample (first
    * `sampleN` rows in storage order — cheap, no full scan, no shuffle)
    * via Spark's own JSON inference, for use as [[flattenJson]]'s
    * explicit schema. The sample bound is the 100 TB safety: inference
    * reads `sampleN` strings ONCE; the corpus-wide pass is then a pure
    * `from_json` projection. Fields present only outside the sample
    * read as null — callers widening a lake column should persist the
    * inferred schema and re-infer on schema-drift alarms, not per job.
    */
  def inferJsonSchema(df: DataFrame, jsonCol: String,
      sampleN: Int = 1000): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample: Dataset[String] =
      df.select(col(jsonCol).cast(StringType)).filter(col(jsonCol).isNotNull)
        .limit(sampleN).as[String]
    spark.read.json(sample).schema
  }

  /** `flattenJson` with the schema inferred from a bounded sample. */
  def flattenJsonInferred(df: DataFrame, jsonCol: String,
      sampleN: Int = 1000, prefix: String = ""): DataFrame =
    flattenJson(df, jsonCol, inferJsonSchema(df, jsonCol, sampleN), prefix)
}

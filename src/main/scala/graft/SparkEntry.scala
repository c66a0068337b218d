package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.binning._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 exercised over the
  * driver's parquet tables; its `oracleSql` twin is the DuckDB-runnable
  * equivalent. Column names are aliased identically on both sides (the
  * driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---- shared axis definitions (single source of truth for Spark + oracle) ----

  /** 1-D: 100 bins over events.value, center-range [0, 500) (A2/A3). */
  val ax1dValue: UniformAxis = UniformAxis("value", 100, 0.0, 500.0)

  /** 2-D on lineitem: quantity × discount. */
  val axQty: UniformAxis = UniformAxis("l_quantity", 49, 1.0, 50.0)
  val axDisc: UniformAxis = UniformAxis("l_discount", 11, 0.0, 0.11)

  /** 4-D on lineitem (the binning_4d analog, BASELINE.md). */
  val ax4d: Seq[UniformAxis] = Seq(
    UniformAxis("l_quantity", 25, 1.0, 50.0),
    UniformAxis("l_extendedprice", 20, 900.0, 105000.0),
    UniformAxis("l_discount", 11, 0.0, 0.11),
    UniformAxis("l_tax", 9, 0.0, 0.09),
  )

  /** Explicit (non-uniform) edges over events.value (`_hist_from_bins`). */
  val axEdges: EdgesAxis =
    EdgesAxis("value", Array(0.0, 10.0, 50.0, 100.0, 200.0, 350.0, 500.0))

  // ---- flagship ----

  /** Flagship: 1-D binned histogram on sf0.001 events; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Binning.histogram(
      table(spark, "/root/testdata/sf0.001", "events"),
      Seq(ax1dValue),
    )

  // ---- operator inventory ----

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2/A3: uniform 1-D histogram (binning_1d analog)
    "q_bin1d" -> ((s, dir) =>
      Binning.histogram(table(s, dir, "events"), Seq(ax1dValue))),
    // A3: 2-D histogram
    "q_bin2d" -> ((s, dir) =>
      Binning.histogram(table(s, dir, "lineitem"), Seq(axQty, axDisc))),
    // A3: 4-D histogram (binning_4d analog)
    "q_bin4d" -> ((s, dir) =>
      Binning.histogram(table(s, dir, "lineitem"), ax4d)),
    // A2: explicit-edge histogram (binsearch kernel)
    "q_bin_edges" -> ((s, dir) =>
      Binning.histogram(table(s, dir, "events"), Seq(axEdges))),
    // A3 return_partitions=True: per-category cubes in one aggregation
    "q_bin_per_part" -> ((s, dir) =>
      Binning.histogramPer(
        table(s, dir, "events"), col("event_type"), "event_type", Seq(ax1dValue))),
    // A7: normalization histogram from the timed table (count × time unit)
    "q_norm_timed" -> ((s, dir) =>
      Binning.normalizationHistogramFromTimedDataframe(
        table(s, dir, "events"), ax1dValue, 0.001)),
  )

  def oracleSql: Map[String, String] = Map(
    "q_bin1d" -> OracleSql.histogramSql("events", Seq(ax1dValue)),
    "q_bin2d" -> OracleSql.histogramSql("lineitem", Seq(axQty, axDisc)),
    "q_bin4d" -> OracleSql.histogramSql("lineitem", ax4d),
    "q_bin_edges" -> OracleSql.histogramSql("events", Seq(axEdges)),
    "q_bin_per_part" -> {
      val j = OracleSql.uniformJ("value", ax1dValue)
      val idx = OracleSql.uniformIdx("j0", ax1dValue)
      s"""SELECT event_type, bin_value, count(*) AS cnt FROM (
         |  SELECT event_type, $idx AS bin_value
         |  FROM (SELECT event_type, $j AS j0 FROM events)
         |  WHERE ${OracleSql.uniformKeep("j0", ax1dValue)}
         |) GROUP BY event_type, bin_value""".stripMargin.replace("\n", " ")
    },
    "q_norm_timed" -> {
      val j = OracleSql.uniformJ("value", ax1dValue)
      val idx = OracleSql.uniformIdx("j0", ax1dValue)
      s"""SELECT bin_value, count(*) * CAST(0.001 AS DOUBLE) AS norm FROM (
         |  SELECT $idx AS bin_value FROM (SELECT $j AS j0 FROM events)
         |  WHERE ${OracleSql.uniformKeep("j0", ax1dValue)}
         |) GROUP BY bin_value""".stripMargin.replace("\n", " ")
    },
  )
}

package graft.dfops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building — turning an event stream
  * of observed states into validity-interval records (SCD type 2), the
  * standard warehouse shape for "what was this entity's attribute at
  * time t" questions and the at-rest form behind as-of joins.
  *
  * Scale design: ONE hash exchange on the entity key serves the whole
  * operator — change-collapse (lag), interval close (lead), and the
  * current-row flag are all windows over the same (key, order) spec, and
  * the filter between them preserves partitioning and sort order, so
  * Catalyst plans exactly one Exchange + one Sort. No joins, no second
  * corpus scan.
  */
object History {

  /** Collapse an observation stream to SCD2 validity intervals: rows
    * where the tracked attributes CHANGED (vs the previous observation
    * per key) survive, each carrying `valid_from` (its order value),
    * `valid_to` (the next change's order value, null while current) and
    * `is_current`. Ties in `orderCol` break by the remaining sort
    * columns for determinism.
    */
  def scd2(df: DataFrame, keyCols: Seq[String], orderCol: String,
      attrCols: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "keys and attrs required")
    require(!df.columns.contains("__prev"),
      "input already has reserved column __prev — rename it first")
    val ord = (orderCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val state = struct(attrCols.map(col): _*)
    val changed = df
      .withColumn("__prev", lag(state, 1).over(w))
      // null-safe inequality: the first observation (prev null) survives
      .filter(!(col("__prev") <=> state))
      .drop("__prev")
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    changed
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time lookup against an SCD2 table: the state valid at
    * `at` per key (`valid_from <= at < valid_to`, open current rows
    * included). A pushdown-friendly filter, no window.
    */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ catalyst Expression bridge. Spark 4 made the public `Column`
  * Connect-compatible and hid the classic expression accessors behind
  * `private[sql]`; extension libraries (custom `Expression`s / aggregates)
  * reach them through a same-package bridge — the standard pattern used by
  * third-party Spark extensions.
  */
object GraftBridge {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` went
    * `private[sql]` with the Connect split) — how a custom
    * [[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]
    * operator enters the public Dataset API.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def analyzedPlan(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Fully convert a Column's node tree to a catalyst Expression using
    * the active session's converter — needed when the expression must be
    * self-contained (e.g. returned from a FunctionRegistry builder),
    * where the lazy [[expression]] wrapper would keep unresolved
    * function nodes that codegen rejects.
    */
  def resolvedExpression(c: Column): Expression = {
    val s = SparkSession.active.asInstanceOf[classic.SparkSession]
    s.expression(c)
  }
}

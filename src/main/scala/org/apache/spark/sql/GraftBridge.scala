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
}

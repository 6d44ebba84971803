package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column<->Expression converters so graft's
  * custom Catalyst expressions can be exposed as Columns (the public
  * Column(Expression) constructor was removed in Spark 4's Connect
  * refactor; `classic.ExpressionUtils` is private[sql]). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

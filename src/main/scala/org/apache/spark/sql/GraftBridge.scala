package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private accessors for Column ↔ Expression conversion (Spark 4
  * moved `Column.expr` behind `private[sql]`); the standard extension-library
  * bridge pattern.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

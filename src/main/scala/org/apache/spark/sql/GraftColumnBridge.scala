package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column<->Expression converters, so custom
  * Catalyst expressions (graft.functions) can be exposed as Columns.
  * Placed in the Spark SQL package — the standard extension-point pattern
  * for libraries shipping native expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

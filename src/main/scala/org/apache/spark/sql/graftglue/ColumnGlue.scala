package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the private[sql] Column <-> Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils), so graft's custom
  * Catalyst expressions can surface as plain Columns. Lives in the
  * org.apache.spark.sql namespace solely for access; contains no logic.
  */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for engine code outside the sql package:
  * Spark 4's Column wraps a ColumnNode and the converters
  * (classic.ExpressionUtils) are private[sql], so operators building a
  * typed Column over a custom Catalyst expression (e.g. the ArrayDot
  * kernel) route through here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

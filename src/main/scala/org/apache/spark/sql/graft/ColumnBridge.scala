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

  /** TypeCoercion.findWiderCommonType is private[sql]; PrestoOperators'
    * null-propagating extremum rewrite needs it to coerce mixed-type
    * greatest/least arguments exactly as Spark's own coercion rule
    * (FunctionArgumentConversion) would have.
    */
  def widerCommonType(dts: Seq[org.apache.spark.sql.types.DataType]):
      Option[org.apache.spark.sql.types.DataType] =
    org.apache.spark.sql.catalyst.analysis.TypeCoercion.findWiderCommonType(dts)

  /** DataType.sameType (nullability-insensitive equality) is
    * private[sql]; the dialect comparison rule needs it to recognize a
    * column-vs-literal array/struct operand pair.
    */
  def sameType(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)
}

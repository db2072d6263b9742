package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column<->Expression conversions so
  * graft's custom Catalyst expressions (PolyHash, DotProduct) can be
  * exposed as plain Columns without registering SQL functions. This is
  * the only file that lives inside Spark's package namespace.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

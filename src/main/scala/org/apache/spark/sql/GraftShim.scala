package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic backend's Column⇄Expression converters, which are
  * `private[sql]` in Spark 4 (Column is ColumnNode-backed there). This is the
  * supported extension seam for libraries that ship custom Catalyst
  * expressions without a FunctionRegistry round-trip. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

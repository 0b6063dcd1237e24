package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's sql-private Column<->Expression conversion
  * (Spark 4 removed the public `Column(expr)` constructor and
  * `col.expr`; extensions conventionally live under
  * org.apache.spark.sql.* for this).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

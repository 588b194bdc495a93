package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the classic converters `private[sql]`
  * (the Column API is now connect-agnostic); extensions that define custom Catalyst
  * expressions need this two-liner inside the `org.apache.spark.sql` package — the
  * established pattern for third-party expression libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for Spark 4.
  *
  * `ExpressionUtils.column/expression` are `private[sql]` in Spark 4.x
  * (the public `Column(expr)` constructor was removed), so custom Catalyst
  * expressions need this one-file shim living under the
  * `org.apache.spark.sql` package tree. Everything else in this repo stays
  * in `graft.*` and uses only public API plus this bridge.
  */
object Shim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge to the `private[sql]` Column ↔ Expression converters, needed
  * to register the engine's Column-composed scalar library as SQL
  * functions (Spark 4 removed `Column.expr` from the public surface
  * when Column went backend-agnostic). This is the entire private-API
  * footprint of the engine — two one-line delegations.
  *
  * `toExpression` runs the full ColumnNode→Expression conversion
  * eagerly: the lazy `ColumnNodeExpression` wrapper that
  * `ExpressionUtils.expression` returns is Unevaluable and is only
  * unwrapped on Dataset API paths, not when an expression enters the
  * plan through the function registry.
  */
object ColumnBridge {
  def toExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}

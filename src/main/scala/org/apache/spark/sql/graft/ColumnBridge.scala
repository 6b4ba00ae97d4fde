package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** The ONE bridge to the `private[sql]` Column ↔ Expression
  * converters (Spark 4 removed `Column.expr` from the public surface
  * when Column went backend-agnostic). This is the entire private-API
  * footprint of the engine — three one-line delegations, each with a
  * distinct job:
  *
  *  - [[toExpression]] — EAGER ColumnNode → Expression conversion.
  *    Required on the function-registry path (SQL extensions): the
  *    lazy wrapper below is Unevaluable there because nothing on that
  *    path unwraps it.
  *  - [[toExpressionLazy]] — the cheap lazy `ColumnNodeExpression`
  *    wrapper. Fine as a child of a native expression that enters the
  *    plan through the Dataset API (the analyzer unwraps it); never
  *    hand it to the function registry.
  *  - [[toColumn]] — Expression → Column, for returning native
  *    kernels to Column-composed code.
  */
object ColumnBridge {
  def toExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
  def toExpressionLazy(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}

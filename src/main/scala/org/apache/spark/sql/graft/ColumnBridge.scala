package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Minimal bridge to the `private[sql]` Column ↔ Expression converters —
  * needed so the SQL FunctionRegistry layer can reuse the Column-based
  * Redshift shims as expression builders. This is the only file outside
  * the `graft` namespace; it adds no behavior.
  *
  * `toExpression` converts eagerly (the lazy `ExpressionUtils.expression`
  * wrapper defers conversion past analysis, leaving unresolvable
  * `columnnodeexpression` nodes in injected-function output).
  */
object ColumnBridge {
  def toExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}

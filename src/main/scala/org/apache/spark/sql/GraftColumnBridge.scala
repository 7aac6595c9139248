package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters
  * (Spark 4 wraps Columns in ColumnNodes; custom catalyst Expressions
  * need the classic converter to surface as Columns). Standard
  * extension-library pattern: one object inside the sql package, no
  * Spark internals re-implemented. */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER conversion of a Column into a real catalyst Expression
    * tree. `toExpression` wraps node-backed Columns (anything composed
    * from `functions._`) in a lazy ColumnNodeExpression that only the
    * Dataset API ever unwraps — handed to the function registry it
    * reaches execution unresolved and throws INTERNAL_ERROR. This
    * converter is what the Dataset path itself runs. */
  def toExpressionTree(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}

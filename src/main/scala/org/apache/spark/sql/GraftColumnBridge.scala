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
}

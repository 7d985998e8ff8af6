package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge.
  *
  * Spark 4 made `Column.expr` / `Column(expr)` private to the sql
  * package (columnNodeSupport.scala); custom Catalyst expressions
  * still need the bridge, so this one-file shim lives in the
  * org.apache.spark.sql package — the documented pattern for
  * extension libraries building native expressions.
  */
object graftbridge {
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}

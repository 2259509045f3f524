package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for Spark 4's classic API, where the direct
  * `new Column(expr)` constructor is gone and `classic.ExpressionUtils` is
  * private[sql]. Placing this shim in the sql package is the standard
  * technique third-party Catalyst extensions use.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column ⇄ Expression converters. Spark 4
  * split the user-facing Column API (sql-api) from Catalyst; the classic
  * converters live behind private[sql], so custom Expressions (e.g.
  * graft.functions.DotProductExpr) need this one-hop shim to surface as
  * Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

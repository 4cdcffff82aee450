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

  /** Re-wrap a DataFrame's execution RDD as a fresh frame with NO origin
    * stats. `Dataset.localCheckpoint` truncates LINEAGE but carries the
    * original plan's statistics on the resulting LogicalRDD — correct for
    * one-shot checkpoints, but inside an iterative loop whose body joins
    * the state frame k times the estimated sizeInBytes COMPOUNDS
    * (product-of-children join estimation): digits grow ~k× per round,
    * and by round 30 Catalyst stats estimation is multiplying
    * million-digit BigIntegers on the driver. Callers that loop re-wrap
    * the checkpointed state through this (zero-copy: the InternalRow RDD
    * is reused), resetting the estimate to the session default each
    * round — at the cost of broadcast eligibility the loop's shuffle
    * joins never wanted.
    */
  def freshFrame(df: Dataset[Row]): DataFrame = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    c.sparkSession.internalCreateDataFrame(c.queryExecution.toRdd, c.schema)
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for graft's custom Catalyst expressions, so
  * `spark.sql("... graft_dot(a, b) ...")` works next to the Column API.
  * Idempotent; callable on any live session (unlike builder-time
  * SparkSessionExtensions, this also covers sessions the driver creates).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => {
        require(exprs.length == 2, "graft_dot(arrayA, arrayB)")
        DotProductExpr(exprs.head, exprs(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms",
      exprs => {
        require(exprs.length == 3, "graft_cms(key, depth, width)")
        CountMinAgg(exprs.head, literalK(exprs(1)), literalK(exprs(2)))
          .toAggregateExpression()
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bottom_k",
      exprs => {
        require(exprs.length == 3, "graft_bottom_k(key, value, k)")
        BottomKAgg(exprs.head, exprs(1), literalK(exprs(2)))
          .toAggregateExpression()
      },
      "scala_udf")
  }

  private def literalK(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    require(e.foldable, "graft_bottom_k's k must be a literal")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"k must be integral, got $other")
    }
  }
}

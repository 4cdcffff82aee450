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
  }
}

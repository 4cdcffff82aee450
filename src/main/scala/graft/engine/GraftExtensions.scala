package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BottomKAgg, DotProductExpr}

/** Builder/config-time extension wiring — the cluster deployment path for
  * graft's custom Catalyst expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.engine.GraftExtensions ...
  * }}}
  *
  * Every session built from that conf resolves `graft_dot` in SQL without
  * any runtime call (SURVEY.md §2.10 preference order: native codegen
  * Expression, surfaced through the standard extension point).
  * [[graft.functions.GraftFunctions.register]] stays as the runtime
  * fallback for sessions the driver harness creates without the conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // §2.10 rung (c): whole-plan rewrite no expression can do — bare
    // range-band joins (nested-loop by default) become banded equi-joins
    ext.injectOptimizerRule(_ => graft.plans.BandedRangeJoinRule)
    // variable-width sibling: `pt BETWEEN iv.lo AND iv.hi` (different
    // columns — no static width) buckets via a max-width scalar subquery
    ext.injectOptimizerRule(_ => graft.plans.IntervalOverlapJoinRule)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot(arrayA, arrayB)")
        DotProductExpr(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bottom_k"),
      new ExpressionInfo(classOf[BottomKAgg].getName, "graft_bottom_k"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "graft_bottom_k(key, value, k)")
        require(exprs(2).foldable, "graft_bottom_k's k must be a literal")
        BottomKAgg(exprs.head, exprs(1),
          exprs(2).eval().asInstanceOf[Number].intValue())
          .toAggregateExpression()
      }))
  }
}

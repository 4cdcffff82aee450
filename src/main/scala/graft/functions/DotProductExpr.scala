package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd sequential dot product over two `array<double>` columns.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function form on the
  * hot path: HOFs evaluate their lambdas interpreted (one closure dispatch
  * per element), while this compiles to a tight Java loop inside
  * whole-stage codegen. The accumulation order is the same strict
  * left-to-right fold, so results stay bit-identical to the HOF form and to
  * the DuckDB oracle's `list_reduce` (see VectorOps).
  *
  * Mismatched lengths fold over the common prefix; null elements are not
  * expected (embedding vectors are dense) and yield 0 contributions.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  // no ExpectsInputTypes: AbstractDataType is private[sql]; call sites
  // (VectorOps) always pass array<double>

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += xs.getDouble(i) * ys.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

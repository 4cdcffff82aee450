package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused sign-bit LSH bucket id: bit b of the result is set iff
  * `v · planes(b) > 0` — one register loop over the plane matrix instead
  * of `bits` literal-array dot trees summed in the plan (the
  * [[CentroidProbesExpr]] discipline for the hyperplane tables; at the
  * default geometry that is ~2k Literal nodes per LSH table removed from
  * every plan). The dot is the same strict left fold, and the strict
  * `> 0` sign test matches the `when(dot > 0, …)` column spelling
  * exactly (NaN and 0 both clear the bit), so bucket ids are
  * bit-identical — OperatorsSpec pins both engines.
  */
case class LshBucketExpr(v: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 63,
    s"need 1..63 planes for a long bucket id: ${planes.length}")

  override def child: Expression = v

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lsh_bucket"

  override protected def nullSafeEval(input: Any): Any =
    LshBucketExpr.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} = graft.functions.LshBucketExpr.compute($in, $pRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): LshBucketExpr = copy(v = newChild)
}

object LshBucketExpr {
  def compute(v: ArrayData, planes: Array[Array[Double]]): Long = {
    val x = v.toDoubleArray() // dense embeddings: a null element fails loudly
    var bucket = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(x.length, p.length)
      var s = 0.0
      var t = 0
      while (t < n) { s += x(t) * p(t); t += 1 }
      if (s > 0.0) bucket |= 1L << b
      b += 1
    }
    bucket
  }
}

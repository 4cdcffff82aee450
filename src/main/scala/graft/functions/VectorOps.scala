package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Catalyst
  * higher-order functions — fully codegen'd, no UDFs, so the hot loop stays
  * inside whole-stage codegen at 100 TB.
  *
  * Every element is cast to double *before* arithmetic: the source columns
  * are float32 and mixed-precision accumulation would diverge from the
  * DuckDB oracle (which computes on `DOUBLE[]`). The left-to-right
  * `aggregate` fold matches DuckDB's `list_reduce`, making results
  * bit-identical across engines (IEEE-754 exactly-rounded ops in the same
  * order).
  */
object VectorOps {

  /** Cast an array<float> column to array<double>. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential left-fold dot product of two equal-length double arrays,
    * as a custom codegen Expression (tight Java loop; see DotProductExpr).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(DotProductExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** The higher-order-function spelling of [[dot]] — kept as the reference
    * implementation; VectorOpsSpec asserts both are bit-identical.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity, given precomputed norms (saves recomputing the
    * norm per candidate pair — at top-k scale the norm is computed once per
    * row, not once per pair).
    */
  def cosineWithNorms(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(dot(a, b), l2Norm(a), l2Norm(b))
}

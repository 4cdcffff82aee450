package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Fused product-quantization code assignment over a normalized embedding
  * column: one pass computes ALL `m` subspace codes —
  * code_s = argmax_j (x_s·c_{s,j} − ‖c_{s,j}‖²/2), ties to the LARGER j
  * (exact argmin ‖x_s−c‖², since ‖x_s‖² is common to every entry of a
  * subspace; the `array_max(struct(d, j))` total order of the literal
  * spelling it replaces) — returned as `array<int>` of length m.
  *
  * The [[CentroidProbesExpr]] discipline applied to the PQ index build
  * (round 17): the literal spelling built m·ksub `array(lit…)` trees of
  * dim/m doubles each plus a bias literal — ~1.5k Literal nodes at the
  * default 8×16×8 geometry, and ksub ∝ quality means the codebook grows
  * like the index's resolution. Codebooks (and their precomputed biases
  * — the SAME left-fold sum-of-squares the literal spelling used) ride
  * `addReferenceObj` task data: constant plan size, one register loop
  * per row inside whole-stage codegen, bit-identical codes
  * (OperatorsSpec pins both engines against the literal spelling).
  *
  * A short input folds each subspace over the available window (the
  * `slice` + common-prefix-dot semantics of the literal spelling);
  * the bias is always the full entry's, exactly as before.
  */
case class PqCodesExpr(
    nv: Expression,
    books: Array[Array[Array[Double]]],
    dsub: Int)
    extends UnaryExpression {
  require(books.nonEmpty && books.forall(_.nonEmpty),
    "codebooks must be non-empty")
  require(dsub > 0, s"dsub must be positive: $dsub")

  override def child: Expression = nv

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_codes"

  /** ‖c‖²/2 per entry, the same Scala left-fold the literal spelling
    * computed driver-side — precomputed once per plan, not per row.
    */
  @transient private lazy val biases: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum / 2.0))

  override protected def nullSafeEval(input: Any): Any =
    PqCodesExpr.compute(input.asInstanceOf[ArrayData], books, biases, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val biasRef = ctx.addReferenceObj("pqBiases", biases, "double[][]")
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} = graft.functions.PqCodesExpr.compute(
         |  $in, $bRef, $biasRef, $dsub);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqCodesExpr = copy(nv = newChild)
}

object PqCodesExpr {
  def compute(
      nv: ArrayData,
      books: Array[Array[Array[Double]]],
      biases: Array[Array[Double]],
      dsub: Int): ArrayData = {
    val v = nv.toDoubleArray() // dense embeddings: a null element fails loudly
    val m = books.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val start = s * dsub
      val winLen = math.max(0, math.min(v.length - start, dsub))
      val book = books(s)
      val bias = biases(s)
      var best = 0
      var bestD = Double.NegativeInfinity
      var j = 0
      while (j < book.length) {
        val c = book(j)
        val n = math.min(winLen, c.length)
        var d = 0.0
        var t = 0
        while (t < n) { d += v(start + t) * c(t); t += 1 }
        d -= bias(j)
        // j only grows, so >= keeps the LARGER code on an exact tie —
        // the array_max(struct(d, j)) total order
        if (java.lang.Double.compare(d, bestD) >= 0) { best = j; bestD = d }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

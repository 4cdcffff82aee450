package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-stable decimal rounding.
  *
  * Spark's `round()` (Catalyst `Round`) rounds the *shortest decimal
  * representation* of a double (`BigDecimal.valueOf` → `Double.toString`),
  * while DuckDB rounds the exact binary value — so a composite score whose
  * shortest repr is exactly "0.79885" rounds to 0.7989 in Spark but 0.7988
  * in DuckDB (observed on text_quality at sf0.01). `floor(x * 10^n + 0.5) /
  * 10^n`, written identically on both sides, is a fixed sequence of
  * exactly-rounded IEEE-754 ops → bit-identical results in any engine.
  *
  * Assumes non-negative inputs (all our money/ratio columns are).
  */
object OracleRound {
  def roundN(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
  def round2(c: Column): Column = roundN(c, 2)
  def round4(c: Column): Column = roundN(c, 4)

  /** The DuckDB spelling of the same op, for oracle SQL templates. */
  def duck(expr: String, digits: Int): String = {
    val p = math.pow(10, digits).toLong
    s"floor(($expr) * $p + 0.5) / $p"
  }
}

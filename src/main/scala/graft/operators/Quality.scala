package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the ingest gate of a
  * training-data pipeline: a caller-declared list of constraints is
  * evaluated over a table in as few passes as the constraint mix allows,
  * producing one report row per constraint
  * `(constraint, violations, n_rows, passed)`.
  *
  * Scale shape (100 TB): every ROW-LEVEL constraint (not-null, range,
  * accepted-values) folds into ONE shared aggregate pass — N constraints
  * cost one scan of exactly the referenced columns, map-side-combined
  * conditional sums, a single-row merge. Uniqueness needs distinct
  * semantics, so each `Unique` runs its own column-pruned branch (a plain
  * single-`countDistinct` two-phase aggregate — no Expand). Referential
  * checks anti-join the BROADCAST dimension key set (dims are
  * broadcast-sized by definition here) and never shuffle the fact table.
  * The per-constraint report rows are single-row frames unioned at the
  * end — constant driver-side width, no fact-scale data past the
  * aggregates.
  */
object Quality {

  /** One declared expectation over a table. `name` is the report key —
    * stable, human-readable, and the report's sort key.
    */
  sealed trait Constraint { def name: String }

  /** Column must be non-null in every row. */
  final case class NotNull(column: String) extends Constraint {
    val name = s"not_null($column)"
  }

  /** Non-null values must fall in [lo, hi] (nulls are NotNull's job). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    val name = s"range($column)"
  }

  /** Non-null values must be one of `values`. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Constraint {
    val name = s"accepted_values($column)"
  }

  /** The column tuple must be unique across the table. Violations =
    * rows beyond the first of each duplicate key. Null keys form a
    * duplicate group like any other value (`struct` of the columns, not
    * SQL DISTINCT-on-column semantics where nulls vanish) — two null-key
    * rows are one violation.
    */
  final case class Unique(columns: Seq[String]) extends Constraint {
    val name = s"unique(${columns.mkString(",")})"
  }

  /** Non-null values must exist in the (broadcast-sized) dimension
    * key column — the foreign-key check. `dimName` labels the report.
    */
  final case class ReferencedIn(
      column: String, dim: DataFrame, dimCol: String, dimName: String)
      extends Constraint {
    val name = s"fk($column->$dimName.$dimCol)"
  }

  /** Evaluate `constraints` over `df`; one report row per constraint,
    * ordered by constraint name. `n_rows` is the number of rows the
    * constraint evaluated: the full table for row-level and unique
    * checks, the non-null count of the FK column for referential checks.
    */
  def checkConstraints(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "declare at least one constraint")
    // duplicate names (e.g. two InRange on one column) would alias two
    // __v_<name> aggregates identically and surface later as an opaque
    // ambiguous-reference AnalysisException — fail clearly up front
    val names = constraints.map(_.name)
    require(names.distinct.size == names.size,
      s"constraint names must be unique, got duplicates: " +
        names.diff(names.distinct).distinct.mkString(", "))

    val rowLevel = constraints.collect {
      case c: NotNull        => c.name -> col(c.column).isNull
      case c: InRange        =>
        c.name -> (col(c.column).isNotNull &&
          !col(c.column).between(c.lo, c.hi))
      case c: AcceptedValues =>
        c.name -> (col(c.column).isNotNull &&
          !col(c.column).isin(c.values: _*))
    }

    // one shared pass: count(*) + one conditional sum per row-level check
    val rowLevelReport: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else Some {
        // coalesce: sum over an EMPTY table is null, and an empty table
        // violates nothing — the report must read (0 violations, passed),
        // not nulls (streaming micro-batches are legitimately empty)
        val aggs = count(lit(1)).as("__n") +: rowLevel.map { case (n, bad) =>
          coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"__v_$n")
        }
        df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rowLevel.map { case (n, _) =>
            struct(lit(n).as("constraint"),
              col(s"__v_$n").as("violations"),
              col("__n").as("n_rows"))
          }: _*)).as("r"))
          .select(col("r.*"))
      }

    // one pruned branch per Unique: plain two-phase distinct aggregate
    val uniqueReports = constraints.collect { case c: Unique =>
      df.select(c.columns.map(col): _*)
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(struct(c.columns.map(col): _*)).as("__nd"))
        .select(lit(c.name).as("constraint"),
          (col("n_rows") - col("__nd")).as("violations"), col("n_rows"))
    }

    // FK: anti-join the broadcast dim key set; the two single-row
    // aggregates (violations, evaluated) cross-join — constant-size
    val fkReports = constraints.collect { case c: ReferencedIn =>
      val keys = c.dim.select(col(c.dimCol)).distinct()
      val fact = df.select(col(c.column)).where(col(c.column).isNotNull)
      val bad = fact
        .join(broadcast(keys), col(c.column) === col(c.dimCol), "left_anti")
        .agg(count(lit(1)).as("violations"))
      val evaluated = fact.agg(count(lit(1)).as("n_rows"))
      bad.crossJoin(evaluated)
        .select(lit(c.name).as("constraint"), col("violations"), col("n_rows"))
    }

    (rowLevelReport.toSeq ++ uniqueReports ++ fkReports)
      .reduce(_.unionByName(_))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("constraint")
  }
}

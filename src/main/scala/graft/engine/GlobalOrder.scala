package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global-order primitives.
  *
  * `Window.orderBy(...)` with no partition spec is Spark's one
  * non-scalable window: the whole input serializes through a single
  * reducer. But an exact global running sum (and therefore an exact global
  * rank) does not need one — the classic distributed prefix-sum topology
  * is:
  *
  *  1. range-repartition by the sort key (a wide exchange, sampling-based
  *     bounds — the same machinery as a distributed ORDER BY);
  *  2. run the running sum per partition (`Window.partitionBy(pid)` — one
  *     reducer PER PARTITION, i.e. full parallelism);
  *  3. add each partition's exclusive offset, computed from a
  *     partition-count-sized aggregate (≤ `defaultParallelism` rows) that
  *     broadcasts.
  *
  * The only unpartitioned window left runs over that bounded offset table
  * — rows = shuffle partitions, never corpus-sized (PlanSpec asserts
  * exactly this shape). For INTEGRAL values the results are EXACT and
  * identical to the single-reducer form: range partitioning totally orders
  * rows across partitions, long addition is associative, and the
  * per-partition layout cancels out of the final sum. For FRACTIONAL
  * values the result is tolerance-equal only: adding the partition offset
  * to each local prefix associates double additions differently from the
  * window's strict left-to-right fold, so ULP-level drift is expected
  * (double addition is not associative). All production callers sum
  * integral values (token counts, lit(1L)).
  */
object GlobalOrder {

  /** Internal partition-id column; PlanSpec keys its unpartitioned-window
    * allowance on aggregates grouping by this name.
    */
  val PidCol = "__gpid"

  /** `df` plus column `out` = running sum of `value` over the GLOBAL order
    * given by `order` (inclusive of the current row) — semantically
    * `sum(value).over(Window.orderBy(order).rowsBetween(unboundedPreceding,
    * currentRow))`, but computed with the distributed topology above.
    * `order` must be a total order (tie-break on a unique key) for the
    * result to be well-defined.
    *
    * With `value = lit(1L)`, `out` is the exact global 1-based rank.
    *
    * The range-partitioned frame is materialized (OpCache — caller
    * releases) so its partition ids stay consistent between the offset
    * aggregate and the main pass.
    */
  def withPrefixSum(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val parts = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val parted = OpCache.materialize(
      df.repartitionByRange(parts, order: _*)
        .withColumn(PidCol, spark_partition_id()))
    // exclusive per-partition offsets: ≤ `parts` rows, so the
    // unpartitioned window here is bounded by the cluster, not the data
    val wOff = Window.orderBy(col(PidCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted
      .groupBy(col(PidCol))
      .agg(sum(value).as("__psum"))
      .select(col(PidCol),
        coalesce(sum(col("__psum")).over(wOff), lit(0L)).as("__off"))
    val wLocal = Window.partitionBy(col(PidCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NO cast on the result: `out` carries sum(value)'s natural type
    // (long for integral inputs, double for doubles) — a blanket long
    // cast would silently truncate fractional running sums
    parted
      .join(broadcast(offsets), PidCol)
      .withColumn(out, col("__off") + sum(value).over(wLocal))
      .drop(PidCol, "__off")
  }

  /** Exact global 1-based rank over `order` (a total order), distributed.
    * Equivalent to `row_number().over(Window.orderBy(order: _*))` as long —
    * without the single reducer.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    withPrefixSum(df, order, lit(1L), out)

  /** Exact distributed `ntile(n) OVER (ORDER BY order)` as an int column:
    * the global rank (same topology as [[withPrefixSum]]) plus ntile's
    * closed-form bucket arithmetic — with N rows, the first N mod n
    * buckets take ceil(N/n) rows, the rest floor(N/n). Bit-identical to
    * the single-reducer window form at full parallelism.
    *
    * Both the per-partition rank offsets AND the total row count ride the
    * same bounded offset aggregate (one broadcast hash join, no extra
    * pass over the ranked frame, no nested-loop single-row crossJoin).
    */
  def withNtile(df: DataFrame, order: Seq[Column], n: Int, out: String): DataFrame = {
    require(n > 0, "ntile needs n > 0")
    val parts = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    val parted = OpCache.materialize(
      df.repartitionByRange(parts, order: _*)
        .withColumn(PidCol, spark_partition_id()))
    val wOff = Window.orderBy(col(PidCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = parted
      .groupBy(col(PidCol))
      .agg(count(lit(1)).as("__pcnt"))
      .select(col(PidCol),
        coalesce(sum(col("__pcnt")).over(wOff), lit(0L)).as("__off"),
        sum(col("__pcnt")).over(wAll).as("__gn"))
    val wLocal = Window.partitionBy(col(PidCol)).orderBy(order: _*)
    val rank = col("__off") + row_number().over(wLocal)
    val q = floor(col("__gn") / n) // base bucket size
    val r = col("__gn") % n        // buckets that take one extra row
    val bigSpan = r * (q + 1)
    // CaseWhen short-circuits, so the q = 0 division in the
    // otherwise-branch is unreachable when N < n
    parted
      .join(broadcast(offsets), PidCol)
      .withColumn(out,
        when(rank <= bigSpan, floor((rank - 1) / (q + 1)) + 1)
          .otherwise(r + floor((rank - bigSpan - 1) / q) + 1)
          .cast("int"))
      .drop(PidCol, "__off", "__gn")
  }
}

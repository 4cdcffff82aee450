package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.OracleRound

/** Broad scalar/array/datetime/pivot function coverage — the parts of the
  * `org.apache.spark.sql.functions` palette not already exercised by the
  * reference-parity or TPC-H queries (SURVEY.md §2.8 "absent" row). All
  * map-only or single-shuffle; all oracle-expressible.
  */
object FunctionSurface {

  /** Higher-order array functions over the embedding vectors: size,
    * element access, filter/count of positives, slice sum — integer or
    * identically-ordered double outputs only.
    */
  def arrayFunctions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        size(filter(col("embedding"), x => x > 0)).as("n_positive"),
        size(array_distinct(col("embedding"))).as("n_distinct"),
        OracleRound.roundN(
          element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
        OracleRound.roundN(array_max(col("embedding")).cast("double"), 6).as("max_val"))

  /** Datetime arithmetic: add days, diff, truncation, parts, last day of
    * month — over order dates.
    */
  def datetimeFunctions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("due_date"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("age_days"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("order_month"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"))
      .orderBy("o_orderkey")

  /** CUBE grouping sets over two dimensions (beyond the ROLLUP already
    * covered); null keys coalesced for unambiguous compare.
    */
  def statusPriorityCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"))
      .orderBy("status", "priority")

  /** INTERSECT set op (EXCEPT is covered elsewhere): hour buckets where
    * both clicks and purchases occurred.
    */
  def clickAndPurchaseHours(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def hours(t: String) = ev.where(col("event_type") === t)
      .select(date_format(window(col("ts"), "1 hour").getField("start"),
        "yyyy-MM-dd HH:mm:ss").as("hour"))
      .distinct()
    hours("click").intersect(hours("purchase")).orderBy("hour")
  }

  /** Pivot: event counts per user pivoted by event type (fixed column set
    * so the schema is deterministic).
    */
  def eventTypePivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy("user_id")
}

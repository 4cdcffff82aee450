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

  /** MapType surface: the events `props` JSON decoded as a
    * map<string,int> (schema-free, unlike the fixed-struct extraction of
    * ref_q4), then key/value/lookup map functions over it — the dynamic-
    * payload path a pipeline takes when property sets vary per event.
    * Map-only.
    */
  def mapFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    val m = from_json(col("props"),
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType))
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        size(m).as("n_keys"),
        concat_ws(",", array_sort(map_keys(m))).as("keys"),
        element_at(m, "k").as("k_val"),
        map_contains_key(m, "missing").as("has_missing"))
      .orderBy("event_id")
  }

  /** Calendar-spine gap fill: every day of a quarter with its order count
    * and revenue, INCLUDING zero-order days — the generate-days → left
    * join → coalesce pattern behind any dense time series report. The
    * spine is generated (sequence + explode, no table), the fact side
    * aggregates BEFORE the join, so the join input is one row per active
    * day.
    */
  def orderDateSpine(spark: SparkSession, sfDir: String): DataFrame = {
    val days = spark.range(1)
      .select(explode(sequence(
        lit("1997-01-01").cast("date"),
        lit("1997-03-31").cast("date"),
        expr("interval 1 day"))).as("day"))
    val perDay = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("rev"))
    days.join(perDay, Seq("day"), "left")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        OracleRound.round2(coalesce(col("rev"), lit(0.0))).as("revenue"))
      .orderBy("day")
  }

  /** Explicit GROUPING SETS (beyond the ROLLUP/CUBE hierarchies): a
    * hand-picked set list — (flag, status), (flag), () — with
    * `grouping_id()` exposed so consumers can tell which set produced a
    * row. Same grouping-set expansion machinery as rollup, one shuffle.
    */
  def returnFlagGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        OracleRound.roundN(sum(col("l_quantity")), 2).as("sum_qty"),
        grouping_id().as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"), col("gid"))
      .orderBy("gid", "returnflag", "linestatus")

  /** String-function palette over customer (SURVEY.md §2.8 "absent" row
    * widened): reverse, pad, key extraction after a delimiter, position,
    * prefix/suffix slices, edit distance — all codegen built-ins with
    * exact DuckDB counterparts. Note: substring_index(c, "#", -1) means
    * "substring after the LAST '#', or the whole string if none"; the
    * oracle mirrors that exactly via CASE + regexp_extract rather than
    * split_part, so parity holds for any input, not just single-'#' names.
    */
  def stringFunctions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(
        col("c_custkey"),
        reverse(col("c_name")).as("rev_name"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
        substring_index(col("c_name"), "#", -1).as("name_num"),
        instr(col("c_name"), "#").as("hash_pos"),
        substring(col("c_name"), 1, 8).as("prefix8"),
        col("c_name").substr(length(col("c_name")) - 2, lit(3)).as("suffix3"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).as("seg_dist"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string"))
          .as("seg_key"))
      .orderBy("c_custkey")

  /** Relational UNPIVOT (melt): the four lineitem measures stacked into
    * (metric, value) rows, then folded per metric — the wide→long reshape
    * every metrics pipeline needs. `Dataset.unpivot` plans as an Expand
    * (map-side row replication ×4, no shuffle) feeding one partial-agg
    * exchange — at scale the melt itself never reshuffles the fact table.
    */
  def metricUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "metric", "value")
      .groupBy(col("metric"))
      .agg(
        count(lit(1)).as("n"),
        graft.functions.OracleRound.round2(sum(col("value"))).as("total"))
      .orderBy("metric")

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

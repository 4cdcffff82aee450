package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** As-of (point-in-time) join — an operator Spark has no built-in for
  * (SURVEY.md §2.3 "absent" row). Composed from built-ins per the
  * preference order (compose > custom strategy): union both sides tagged,
  * sort within each key by (time, side), and carry the right side's latest
  * values forward with `last(_, ignoreNulls)` over an unbounded-preceding
  * window. One shuffle on the key — the same cost profile as a sort-merge
  * join, with no per-key driver loops, so it scales like any windowed agg.
  *
  * Tie semantics: a right-side row at exactly t matches (inclusive `<=`),
  * because right rows sort before left rows at equal time. Rights are
  * pre-deduped per (key, time) keeping the max id, making ties
  * deterministic on both engines (DuckDB ASOF picks an arbitrary row
  * otherwise).
  */
object AsOfJoin {

  /** For each event, the latest order of the same user with
    * o_orderdate <= ts (left as-of join; events with no prior order keep
    * nulls).
    */
  def eventsToLatestOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(
        col("o_custkey").as("key"), col("o_orderdate").as("t"),
        lit(0).as("side"), col("o_orderkey"),
        lit(null).cast("long").as("event_id"))
    val events = Tables.events(spark, sfDir)
      .select(
        col("user_id").as("key"), col("ts").as("t"),
        lit(1).as("side"), lit(null).cast("long").as("o_orderkey"),
        col("event_id"))

    val w = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    orders.unionByName(events)
      .withColumn("matched_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(
        col("event_id"),
        col("key").as("user_id"),
        col("matched_orderkey"))
  }

  /** Forward as-of: for each event, the EARLIEST order of the same user
    * with o_orderdate >= ts (events with no later order keep nulls) —
    * the "next action after the signal" direction of the same composed
    * plan, mirrored: rights sort AFTER lefts at equal time (inclusive
    * `>=`), and the carry runs over an unbounded-FOLLOWING frame with
    * `first(_, ignoreNulls)`. Rights pre-deduped per (key, time) keeping
    * the MIN id so ties are deterministic in both engines.
    */
  def eventsToNextOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(min(col("o_orderkey")).as("o_orderkey"))
      .select(
        col("o_custkey").as("key"), col("o_orderdate").as("t"),
        lit(1).as("side"), col("o_orderkey"),
        lit(null).cast("long").as("event_id"))
    val events = Tables.events(spark, sfDir)
      .select(
        col("user_id").as("key"), col("ts").as("t"),
        lit(0).as("side"), lit(null).cast("long").as("o_orderkey"),
        col("event_id"))

    val w = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    orders.unionByName(events)
      .withColumn("next_orderkey", first(col("o_orderkey"), ignoreNulls = true).over(w))
      .where(col("side") === 0)
      .select(
        col("event_id"),
        col("key").as("user_id"),
        col("next_orderkey"))
  }
}

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

  /** Nearest as-of: for each event, the same user's order closest in time
    * in EITHER direction — both carries in ONE pass over one union (the
    * backward `last` and forward `first` windows share the (t, side)
    * sort), then a per-row comparison picks the smaller gap. Ties at
    * equal distance prefer backward; an order at exactly the event time
    * is a backward match with gap 0 (which always wins), so the forward
    * side being equal-exclusive under this sort order costs nothing.
    * Orders pre-deduped per (key, time) keeping the MIN id (one
    * convention for both directions). Gaps are compared and reported at
    * SECOND granularity — both engines truncate timestamps identically
    * there, so the direction choice is deterministic cross-engine.
    * Still one shuffle on the key, like both single-direction forms.
    */
  def eventsToNearestOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(min(col("o_orderkey")).as("ok"))
      .select(
        col("o_custkey").as("key"), col("o_orderdate").as("t"),
        lit(0).as("side"),
        struct(col("o_orderdate").as("ot"), col("ok")).as("o"),
        lit(null).cast("long").as("event_id"))
    val events = Tables.events(spark, sfDir)
      .select(
        col("user_id").as("key"), col("ts").as("t"),
        lit(1).as("side"),
        lit(null).cast("struct<ot:timestamp,ok:bigint>").as("o"),
        col("event_id"))

    val wPrev = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val carried = orders.unionByName(events)
      .withColumn("prev", last(col("o"), ignoreNulls = true).over(wPrev))
      .withColumn("nxt", first(col("o"), ignoreNulls = true).over(wNext))
      .where(col("side") === 1)
    val gapPrev = col("t").cast("long") - col("prev.ot").cast("long")
    val gapNext = col("nxt.ot").cast("long") - col("t").cast("long")
    carried.select(
      col("event_id"),
      col("key").as("user_id"),
      when(col("prev").isNull && col("nxt").isNull, lit(null).cast("long"))
        .when(col("nxt").isNull, col("prev.ok"))
        .when(col("prev").isNull, col("nxt.ok"))
        .when(gapPrev <= gapNext, col("prev.ok"))
        .otherwise(col("nxt.ok")).as("nearest_orderkey"),
      when(col("prev").isNull && col("nxt").isNull, lit(null).cast("string"))
        .when(col("nxt").isNull, lit("backward"))
        .when(col("prev").isNull, lit("forward"))
        .when(gapPrev <= gapNext, lit("backward"))
        .otherwise(lit("forward")).as("direction"),
      when(col("prev").isNull && col("nxt").isNull, lit(null).cast("long"))
        .when(col("nxt").isNull, gapPrev)
        .when(col("prev").isNull, gapNext)
        .when(gapPrev <= gapNext, gapPrev)
        .otherwise(gapNext).as("gap_seconds"))
  }
}

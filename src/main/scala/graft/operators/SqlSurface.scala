package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** The `spark.sql` entry point of the engine: temp-view registration plus
  * ANSI-SQL queries — a user of the reference's DataFrame surface can also
  * drive everything through SQL (same Catalyst plans either way).
  */
object SqlSurface {

  /** Register every testdata table as a temp view named as in TESTDATA.md,
    * plus graft's SQL functions (graft_dot).
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.names.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    graft.functions.GraftFunctions.register(spark)
  }

  /** Run a SQL query against the registered views. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(query)
  }

  /** Revenue by order status via pure SQL — exercises the parser path end
    * to end (same physical plan as the DataFrame form).
    */
  def revenueByStatus(spark: SparkSession, sfDir: String): DataFrame =
    sql(spark, sfDir,
      """SELECT o_orderstatus,
        |       count(*) AS n_orders,
        |       floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin)

  /** Pairwise dot products of the first few embeddings via the SQL-
    * registered custom expression (`graft_dot`) — proves the codegen
    * Expression is reachable from the SQL surface, not just the Column API.
    */
  def sqlDotProducts(spark: SparkSession, sfDir: String): DataFrame =
    sql(spark, sfDir,
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |       graft_dot(transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |                 transform(b.embedding, x -> CAST(x AS DOUBLE))) AS dot
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < b.vec_id AND a.vec_id < 5 AND b.vec_id < 5
        |ORDER BY vec_a, vec_b""".stripMargin)

  /** HLL approximate distinct (approx_count_distinct) next to the exact
    * count — the approximation target the oracle can't mirror exactly, so
    * ApproxSpec bounds its relative error instead.
    */
  def approxUserCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy("event_type")

  /** [[approxUserCounts]] in oracle-checkable form: HLL sketch values are
    * engine-specific, so the raw approximation can never hash-match a
    * DuckDB oracle — but the exact count can, and the approximation's
    * contract folds into a boolean the oracle pins to TRUE. If the sketch
    * ever drifts out of tolerance the boolean flips and the driver's hash
    * compare fails — the approx is bounded in-query, not just in a spec.
    *
    * Tolerance: 3× the configured rsd (default 5% → 15%). The rsd is a
    * STANDARD DEVIATION, not a hard bound — pinning the boolean at 1× rsd
    * turns a statistically legitimate >1σ estimate (sizeable per-group
    * probability on regenerated or scaled data) into a hard gate failure;
    * 3σ makes a flip evidence of sketch breakage, not sampling luck
    * (round-6 advice).
    */
  def approxUserCountsChecked(spark: SparkSession, sfDir: String): DataFrame =
    approxUserCounts(spark, sfDir)
      .select(
        col("event_type"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.15).as("approx_within_tol"))
      .orderBy("event_type")

  /** Batch session-window aggregation (session_window: gap-merged windows
    * — the built-in cousin of StreamOps.sessionize): sessions per user with
    * a 30-minute gap, event counts per session.
    */
  def sessionWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")
}

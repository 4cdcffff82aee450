package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.EventPipelines

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] produces a deterministic result: rows ordered
  * by a unique key, `collect_set` outputs `sort_array`-ed, timestamps
  * formatted as strings, and floating-point aggregates rounded — so the
  * driver's DuckDB hash-compare is stable (SURVEY.md §7 "hard parts").
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Batch analog of the reference's Q3 (1-minute tumbling window +
    * collect_set — srapk_structure_streaming.py:150-165).
    */
  def entry(spark: SparkSession): DataFrame =
    EventPipelines.windowDistinct(
      Tables.events(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── reference parity (events = streaming-analog table) ──────────────
    "ref_q1_filter" -> ((s, d) =>
      EventPipelines.filterByType(Tables.events(s, d), "error")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")),
    "ref_q2_join" -> ((s, d) =>
      EventPipelines.joinTypeLookup(Tables.events(s, d))
        .select("event_id", "user_id", "type_name", "value")
        .orderBy("event_id")),
    "ref_q3_window_agg" -> ((s, d) =>
      EventPipelines.windowDistinct(Tables.events(s, d))
        .orderBy("window_start")),
    "ref_q4_json_extract" -> ((s, d) =>
      EventPipelines.parseProps(Tables.events(s, d))
        .orderBy("event_id")),
    "ref_q5_datetime" -> ((s, d) =>
      EventPipelines.datetimeParts(Tables.events(s, d))
        .orderBy("event_id")),
    "ref_q6_to_json" -> ((s, d) =>
      EventPipelines.toJsonPayload(Tables.events(s, d))
        .orderBy("event_id")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "ref_q1_filter" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'error' ORDER BY event_id""".stripMargin,
    "ref_q2_join" ->
      """SELECT e.event_id, e.user_id, v.type_name, e.value
        |FROM events e
        |JOIN (VALUES ('click','CLICK EVENT'), ('error','ERROR EVENT'),
        |             ('purchase','PURCHASE EVENT'), ('signup','SIGNUP EVENT'),
        |             ('view','VIEW EVENT')) AS v(event_type, type_name)
        |  ON e.event_type = v.event_type
        |ORDER BY e.event_id""".stripMargin,
    "ref_q3_window_agg" ->
      """SELECT strftime(time_bucket(INTERVAL '1 minute', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       strftime(time_bucket(INTERVAL '1 minute', ts::TIMESTAMP) + INTERVAL '1 minute', '%Y-%m-%d %H:%M:%S') AS window_end,
        |       list_sort(list(DISTINCT event_type)) AS types,
        |       count(*) AS n
        |FROM events
        |GROUP BY time_bucket(INTERVAL '1 minute', ts::TIMESTAMP)
        |ORDER BY window_start""".stripMargin,
    "ref_q4_json_extract" ->
      """SELECT event_id, CAST(props->>'k' AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "ref_q5_datetime" ->
      """SELECT event_id,
        |       CAST(month(ts::TIMESTAMP) AS INTEGER) AS month,
        |       CAST(day(ts::TIMESTAMP) AS INTEGER) AS day,
        |       CAST(hour(ts::TIMESTAMP) AS INTEGER) AS hour,
        |       CAST(minute(ts::TIMESTAMP) AS INTEGER) AS minute
        |FROM events ORDER BY event_id""".stripMargin,
    "ref_q6_to_json" ->
      """SELECT event_id,
        |       to_json(struct_pack(event_type := event_type, user_id := user_id))::VARCHAR AS payload
        |FROM events ORDER BY event_id""".stripMargin,
  )
}

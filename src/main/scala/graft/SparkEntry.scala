package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{EventPipelines, Relational}

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
    // ── relational / TPC-H-style coverage (SURVEY.md §2.3-2.8) ──────────
    "tpch_q1_pricing" -> ((s, d) => Relational.pricingSummary(s, d)),
    "tpch_q3_top10" -> ((s, d) => Relational.shippingPriority(s, d)),
    "tpch_q5_nation_revenue" -> ((s, d) => Relational.localSupplierVolume(s, d)),
    "join_semi_open_orders" -> ((s, d) => Relational.customersWithOpenOrders(s, d)),
    "join_anti_no_orders" -> ((s, d) => Relational.customersWithoutOrders(s, d)),
    "join_outer_nation_counts" -> ((s, d) => Relational.nationCustomerCounts(s, d)),
    "window_top2_per_customer" -> ((s, d) => Relational.topOrdersPerCustomer(s, d)),
    "topk_orders" -> ((s, d) => Relational.topOrders(s, d)),
    "set_except_click_no_purchase" -> ((s, d) => Relational.clickedNotPurchased(s, d)),
    "dedup_first_event" -> ((s, d) => Relational.firstEventPerUserType(s, d)),
    "rollup_returnflag" -> ((s, d) => Relational.returnFlagRollup(s, d)),
    "scalar_buckets" -> ((s, d) => Relational.orderValueBuckets(s, d)),
    "join_above_cust_avg" -> ((s, d) => Relational.aboveCustomerAverage(s, d)),
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
    "tpch_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 2) AS avg_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q3_top10" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1999-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "tpch_q5_nation_revenue" ->
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "join_semi_open_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "join_outer_nation_counts" ->
      """SELECT n_nationkey, n_name, count(c_custkey) AS n_customers
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey, n_name
        |ORDER BY n_nationkey""".stripMargin,
    "window_top2_per_customer" ->
      """SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice,
        |       round(o_totalprice / cust_total * 100, 2) AS pct_of_cust
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |         sum(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_total
        |  FROM orders)
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "set_except_click_no_purchase" ->
      """SELECT DISTINCT strftime(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS hour
        |FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT DISTINCT strftime(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S')
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY hour""".stripMargin,
    "dedup_first_event" ->
      """SELECT user_id, event_type, event_id FROM (
        |  SELECT user_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts::TIMESTAMP, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "rollup_returnflag" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       count(*) AS n,
        |       round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "scalar_buckets" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice < 100000 THEN 'SMALL'
        |            WHEN o_totalprice < 300000 THEN 'MEDIUM'
        |            ELSE 'LARGE' END AS bucket,
        |       upper(substr(o_orderpriority, 1, 1)) AS prio_code,
        |       CAST(length(o_orderpriority) AS INTEGER) AS prio_len,
        |       CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 1 ELSE 0 END AS is_urgent
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "join_above_cust_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |JOIN (SELECT o_custkey AS k, avg(o_totalprice) AS avg_price
        |      FROM orders GROUP BY o_custkey) a
        |  ON o.o_custkey = a.k
        |WHERE o.o_totalprice > a.avg_price
        |ORDER BY o_orderkey""".stripMargin,
  )
}

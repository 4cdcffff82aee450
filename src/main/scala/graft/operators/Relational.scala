package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.OracleRound

/** Relational / TPC-H-style operators over the driver testdata, extending the
  * reference's surface (SURVEY.md §2.3/§2.4/§2.5/§2.6/§2.7 "absent" rows) to
  * a complete batch-analytics palette: multi-way joins, semi/anti joins,
  * grouped + rollup aggregation, OVER-clause windows, top-k, set ops,
  * deterministic dedup.
  *
  * Scale notes (100 TB design):
  *  - Fixed-size dimensions (region: 5 rows, nation: 25 rows, in-memory
  *    lookups) are broadcast explicitly — the fact table never shuffles for
  *    those joins. SF-scaled tables (customer/supplier/part) get NO hint:
  *    Catalyst/AQE broadcasts them while small and switches to shuffle
  *    joins when they outgrow spark.sql.autoBroadcastJoinThreshold.
  *  - fact⋈fact joins (lineitem⋈orders) shuffle on the join key; AQE handles
  *    skew/coalescing at runtime (enabled in graft.engine.Sessions).
  *  - All money aggregates are rounded at the output edge only, never
  *    mid-plan, so partial aggregation (map-side combine) stays exact.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: grouped aggregation with partial
    * (map-side) aggregation; the shipdate filter is pushed to the parquet
    * scan (visible as PushedFilters in explain).
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        OracleRound.roundN(sum(col("l_quantity")), 2).as("sum_qty"),
        OracleRound.roundN(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        OracleRound.roundN(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        OracleRound.roundN(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        OracleRound.roundN(avg(col("l_quantity")), 2).as("avg_qty"),
        OracleRound.roundN(avg(col("l_extendedprice")), 2).as("avg_price"),
        OracleRound.roundN(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: segment customers ⋈ orders ⋈ lineitem, revenue per
    * order, top 10. customer scales with SF (15 M rows at sf100), so no
    * explicit broadcast hint — Catalyst/AQE picks broadcast while the
    * filtered side fits and falls back to shuffle join beyond that.
    */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(OracleRound.roundN(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(
        col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation for one region. nation/region are
    * fixed-size (25/5 rows at every SF) → broadcast hints; customer and
    * supplier grow with SF (15 M / 1 M rows at sf100) → no hint, so
    * Catalyst/AQE can switch them to shuffle joins once they outgrow the
    * broadcast threshold. lineitem shuffles once (for its join to orders).
    */
  def localSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.region(spark, sfDir).where(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, sfDir)
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val sup = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(OracleRound.roundN(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Left-semi join: customers that have at least one open order (EXISTS). */
  def customersWithOpenOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderstatus") === "O").select("o_custkey")
    Tables.customer(spark, sfDir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Left-anti join: customers with no in-progress ('P') order (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderstatus") === "P").select("o_custkey")
    Tables.customer(spark, sfDir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Outer join + null handling: every nation with its customer count
    * (nations with none keep count 0).
    */
  def nationCustomerCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    Tables.nation(spark, sfDir)
      .join(cust, col("n_nationkey") === col("c_nationkey"), "left_outer")
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"))
      .orderBy("n_nationkey")
  }

  /** OVER-clause window functions: top-2 orders per customer by total price
    * (rank), plus each order's share of the customer total. Deterministic
    * tie-break on o_orderkey.
    */
  def topOrdersPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .withColumn("cust_total", sum(col("o_totalprice")).over(wAll))
      .where(col("rn") <= 2)
      .select(
        col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"),
        OracleRound.roundN(col("o_totalprice") / col("cust_total") * 100, 2).as("pct_of_cust"))
      .orderBy("o_custkey", "rn")
  }

  /** Global top-k with deterministic tie-break (sort + limit; Spark executes
    * as TakeOrderedAndProject — no full sort at scale).
    */
  def topOrders(spark: SparkSession, sfDir: String, k: Int = 25): DataFrame =
    Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Set operation (EXCEPT): hour buckets that saw clicks but no purchases.
    * `except` plans as a distinct-aggregate anti-join — shuffles on the full
    * row, which is fine for the low-cardinality bucket domain.
    */
  def clickedNotPurchased(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def hours(t: String) = ev.where(col("event_type") === t)
      .select(date_format(window(col("ts"), "1 hour").getField("start"),
        "yyyy-MM-dd HH:mm:ss").as("hour"))
      .distinct()
    hours("click").except(hours("purchase")).orderBy("hour")
  }

  /** Deterministic dedup: keep the earliest event per (user_id, event_type)
    * via row_number ordered by (ts, event_id) — the streaming analog is
    * dropDuplicatesWithinWatermark (graft.streaming).
    */
  def firstEventPerUserType(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("user_id", "event_type", "event_id")
      .orderBy("user_id", "event_type")
  }

  /** ROLLUP aggregation (grouping-set hierarchy); null grouping keys are
    * coalesced to 'ALL' so the oracle compare is unambiguous.
    */
  def returnFlagRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        OracleRound.roundN(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** Scalar-function palette: CASE WHEN bucketing, string functions, LIKE —
    * the built-ins the reference never used (SURVEY.md §2.8 "absent" row).
    */
  def orderValueBuckets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") < 100000, "SMALL")
          .when(col("o_totalprice") < 300000, "MEDIUM")
          .otherwise("LARGE").as("bucket"),
        upper(substring(col("o_orderpriority"), 1, 1)).as("prio_code"),
        length(col("o_orderpriority")).as("prio_len"),
        when(col("o_orderpriority").like("%URGENT%"), 1).otherwise(0).as("is_urgent"))
      .orderBy("o_orderkey")

  /** Two-phase salted aggregation — the skew-mitigation pattern for
    * heavy-hitter keys at 100 TB: phase 1 aggregates on (key, salt) so one
    * hot key spreads over `salts` reducers; phase 2 merges the partials.
    * Result is identical to a direct groupBy (the oracle checks exactly
    * that); sums stay integer-safe by rounding only at the output edge.
    */
  def saltedUserTypeCounts(spark: SparkSession, sfDir: String, salts: Int = 8): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
    val partial = ev
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
    partial
      .groupBy(col("user_id"))
      .agg(sum(col("pn")).as("n_events"),
        OracleRound.round2(sum(col("pv"))).as("total_value"))
      .orderBy("user_id")
  }

  /** Salted equi-join — the skew-mitigation pattern for a shuffle join
    * whose key distribution has heavy hitters (AQE's skew-join split
    * handles this at runtime; salting is the explicit, planner-visible
    * form for when AQE cannot, e.g. an iterative loop or a join feeding a
    * co-partitioned consumer). The fact side gets `salt =
    * pmod(xxhash64(saltSrc), salts)` from a per-row unique column, so one
    * hot key spreads evenly over `salts` (key, salt) shuffle groups; the
    * dim side is replicated `salts`× with an explode — dim cost is
    * |dim|·salts rows, which is the knob: salts covers the hottest key's
    * row count / target-task-size. Both sides carry a merge hint so the
    * demonstration stays a SortMergeJoin even when the dim would
    * broadcast at test SF (broadcast would make salting moot — at 100 TB
    * the dim side of a salted join is big by assumption). Results are
    * identical to the plain join: every fact row meets exactly the one
    * dim replica bearing its salt.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltSrc: org.apache.spark.sql.Column,
      salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltSrc), lit(salts)))
    val replicated = dim.withColumn(
      "__salt", explode(array((0 until salts).map(lit(_)): _*)))
    salted.hint("merge")
      .join(replicated.hint("merge"), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Deliberately-skewed join demonstrated salted: events (fact; user_id
    * is the skewed key in a real event stream) ⋈ per-user order counts
    * (dim), then a per-(user, type) rollup. Integral aggregates only, so
    * the oracle compare is exact — the salt must be invisible in the
    * result.
    */
  def saltedEventOrderJoin(
      spark: SparkSession, sfDir: String, salts: Int = 16): DataFrame = {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val dim = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("ord_cnt"))
    saltedJoin(events, dim, "user_id", col("event_id"), salts)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("ord_cnt")).as("ord_weight"))
      .orderBy("user_id", "event_type")
  }

  /** Banded event-time RANGE join — the operator family Spark has no
    * native physical plan for (a bare range predicate plans a
    * nested-loop over the full cross space). The classic distributed
    * rewrite: band both sides into fixed-width time buckets sized to the
    * range width, equi-join on the bucket (each probe row explodes to
    * exactly 2 buckets since the window spans at most 2), then apply the
    * exact range predicate to the bucket-colocated candidates. Cost is
    * |candidates sharing a bucket| — event-rate × window, the join's
    * inherent output scale — instead of |purchases| × |clicks|.
    *
    * Query: for each purchase, the count of platform-wide clicks in the
    * preceding hour (attribution/context feature).
    */
  def purchaseClickContext(spark: SparkSession, sfDir: String): DataFrame = {
    val usPerHour = 3600L * 1000000L
    val ev = Tables.events(spark, sfDir)
    // `div` is exact long floor-division (timestamps are non-negative) —
    // a double `floor(x / width)` could misbucket values within an ulp of
    // an hour boundary and silently drop a candidate pair
    val clicks = ev.where(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("cus"))
      .withColumn("bucket", expr(s"cus div ${usPerHour}L"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("pus"))
    // window (pus − 1h, pus] spans at most 2 hour-buckets — the explode
    // is the whole "index probe"
    val probed = purchases.withColumn("bucket",
      explode(array(expr(s"pus div ${usPerHour}L"),
        expr(s"pus div ${usPerHour}L") - 1)))
    val counts = probed.join(clicks, Seq("bucket"))
      .where(col("cus") > col("pus") - usPerHour && col("cus") <= col("pus"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_clicks_prior_hour"))
    ev.where(col("event_type") === "purchase")
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
      .join(counts, Seq("event_id"), "left")
      .select(col("event_id"), col("purchase_ts"),
        coalesce(col("n_clicks_prior_hour"), lit(0L)).as("n_clicks_prior_hour"))
      .orderBy("event_id")
  }

  /** Variable-width interval overlap join — the general form of the banded
    * range join above (and of `plans.BandedRangeJoinRule`, which only
    * handles FIXED-width bands statically). SQL sessions deployed with
    * `GraftExtensions` get this rewrite AUTOMATICALLY for the naive
    * `pt BETWEEN lo AND hi` spelling via
    * `plans.IntervalOverlapJoinRule` (width lifted from a max-width
    * scalar subquery); call this operator directly to pick a tighter
    * width than the max when the length distribution is skewed.
    * `points` rows match every
    * `intervals` row whose `[loCol, hiCol]` (inclusive, long) contains
    * `ptCol`. A bare overlap predicate has no equi key, so Spark would
    * nested-loop the cross space; instead each point buckets ONCE
    * (`pt div width`) and each interval explodes to its covering bucket
    * range (`sequence(lo div width, hi div width)`), turning the overlap
    * into an equi-join on the bucket with the exact predicate as residual.
    * A matched pair meets in exactly one bucket (the point's), so no
    * dedup step is needed. `div` truncates toward zero rather than
    * flooring, but any monotone bucketing works here — the interval side
    * covers a RANGE of cells, so unlike the fixed-band rewrite no
    * equal-width cell identity is required, only lo ≤ pt ≤ hi ⇒
    * bucket(lo) ≤ bucket(pt) ≤ bucket(hi).
    *
    * Cost model: intervals replicate ⌈len/width⌉+1 times and candidates
    * per bucket are |points in bucket| × |intervals covering it| — width
    * should sit near the typical interval length (smaller → more interval
    * replicas; larger → fatter buckets). Callers with unknown data can
    * take `maxIntervalWidth` (one column-pruned agg pass) as a safe
    * upper bound: every interval then covers ≤ 2 buckets, at the price of
    * outlier-sized buckets if lengths are skewed.
    *
    * Column names must be distinct across the two frames; rows with
    * `lo > hi` (empty intervals) match nothing and are pruned before the
    * explode (Spark's `sequence` would otherwise DESCEND and fabricate
    * buckets).
    */
  def intervalJoin(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val p = points.withColumn("__g_bucket", expr(s"`$ptCol` div ${width}L"))
    val iv = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__g_bucket",
        explode(expr(s"sequence(`$loCol` div ${width}L, `$hiCol` div ${width}L)")))
    p.join(iv, Seq("__g_bucket"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__g_bucket")
  }

  /** Largest interval length + 1: the safe (≤ 2 buckets per interval)
    * width for [[intervalJoin]] when the length distribution is unknown.
    * An empty (or all-null) intervals frame has no width — that is a
    * usable error here, not an NPE on the null aggregate (round-6 advice).
    */
  def maxIntervalWidth(intervals: DataFrame, loCol: String, hiCol: String): Long = {
    val r = intervals.agg(max(col(hiCol) - col(loCol))).head()
    if (r.isNullAt(0))
      throw new IllegalArgumentException(
        s"maxIntervalWidth: no intervals (empty frame or all-null `$loCol`/`$hiCol`) — " +
          "pass an explicit width to intervalJoin instead")
    r.getLong(0) + 1L
  }

  /** Bloom-filter semi-join reduction: prune the fact side BEFORE its
    * shuffle with a Bloom filter built from the (filtered) dim keys, then
    * run the exact join. At 100 TB the dominant join cost is exchanging
    * fact rows that cannot match a selective dim — the Bloom pre-filter
    * drops them at the scan (a map-only `might_contain` on `xxhash64` of
    * the key, native codegen'd Catalyst expressions — the same machinery
    * Spark's own `runtime.bloomFilter` optimization injects, made
    * explicit and deterministic here). False positives only ever ADD
    * already-droppable rows that the exact join then removes, so the
    * result is bit-identical to the plain join.
    *
    * The filter is built with one aggregate over the dim and pulled to
    * the driver as a byte array (size O(expectedItems); ~1.2 MB at fpp 3%
    * per million keys) and embedded as a plan literal — the bounded-pull
    * pattern of the ANN centroids. Fits dims up to ~10 M distinct keys;
    * beyond that leave it to Spark's subquery-based auto runtime filter
    * instead of a driver pull.
    */
  /** The pruning stage of [[bloomPrunedJoin]], exposed so callers can
    * reuse one dim filter across several fact scans (or measure the
    * reduction): `fact` minus the rows whose key cannot be in `dim`.
    */
  def bloomPruneFact(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val bfAgg = GraftBridge.column(
      new BloomFilterAggregate(
        GraftBridge.expression(xxhash64(col(dimKey))),
        Literal(expectedItems)).toAggregateExpression())
    val bytes = dim.agg(bfAgg.as("bf")).head().getAs[Array[Byte]](0)
    // empty dim → null filter; nothing can match, but stay exact and let
    // the join produce the (empty) result
    if (bytes == null) fact
    else fact.where(GraftBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      GraftBridge.expression(xxhash64(col(factKey))))))
  }

  def bloomPrunedJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long): DataFrame =
    bloomPruneFact(fact, factKey, dim, dimKey, expectedItems)
      .join(dim, col(factKey) === col(dimKey))

  /** Concrete [[bloomPrunedJoin]] query: revenue of lineitems belonging
    * to urgent-priority orders. The priority filter makes orders
    * selective (~1/5 of rows), so the Bloom pre-filter drops most of
    * lineitem before the join's exchange — bit-identical to the plain
    * join by construction.
    */
  def bloomPrunedUrgentRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linestatus"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    bloomPrunedJoin(li, "l_orderkey", urgent, "o_orderkey", 100000L)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"), OracleRound.round2(sum(col("rev"))).as("revenue"))
      .orderBy("l_linestatus")
  }

  /** Concrete [[intervalJoin]] query: per-user daily activity spans
    * (variable-width intervals — first to last event of each user-day)
    * scored by how many platform-wide purchases fell inside the span.
    * Keyless overlap (the purchases are NOT the user's own), the shape a
    * co-activity / contention feature takes. Width = 1 day bounds each
    * span to ≤ 2 covering buckets since spans never cross midnight.
    */
  def userDayPurchaseOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val usPerDay = 86400L * 1000000L
    val ev = Tables.events(spark, sfDir)
    val spans = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(unix_micros(min(col("ts"))).as("span_lo"),
        unix_micros(max(col("ts"))).as("span_hi"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(unix_micros(col("ts")).as("pus"))
    intervalJoin(purchases, "pus", spans, "span_lo", "span_hi", usPerDay)
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_overlap_purchases"))
      // left-join back so zero-overlap spans survive with an explicit 0
      .join(spans.select(col("user_id"), col("day")), Seq("user_id", "day"), "right")
      .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_overlap_purchases"), lit(0L)).as("n_overlap_purchases"))
      .orderBy("user_id", "day")
  }

  /** Approx-percentile sketch with its contract bounded in-query — the
    * [[SqlSurface.approxUserCounts]] pattern for quantiles: the
    * Greenwald-Khanna sketch value is engine-/merge-order-specific and
    * can never hash-match an external oracle, so the query emits the
    * EXACT interpolated percentiles (rounded at the edge) plus a boolean
    * pinning the sketch within 15% of each group's value range. The GK
    * accuracy parameter bounds RANK error, not value error, so the value
    * bound is heuristic — 15% (3× the original 5%) keeps the gate a
    * breakage detector rather than a sampling-luck coin flip on
    * regenerated data (round-6 advice). Sketch drift beyond that flips
    * the boolean and fails the driver's hash compare.
    */
  def approxPercentilesChecked(spark: SparkSession, sfDir: String): DataFrame = {
    val tol = (col("vmax") - col("vmin")) * 0.15
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, array(0.5, 0.9))").as("ap"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        min(col("value")).as("vmin"),
        max(col("value")).as("vmax"))
      .select(
        col("event_type"),
        OracleRound.roundN(col("p50"), 4).as("exact_p50"),
        OracleRound.roundN(col("p90"), 4).as("exact_p90"),
        (abs(element_at(col("ap"), 1) - col("p50")) <= tol &&
          abs(element_at(col("ap"), 2) - col("p90")) <= tol)
          .as("sketch_within_tol"))
      .orderBy("event_type")
  }

  /** Statistical aggregates: exact interpolated median (percentile),
    * sample stddev, Pearson correlation — rounded at the edge since
    * variance/corr accumulation order differs across engines.
    */
  def orderStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(
        OracleRound.round2(expr("percentile(o_totalprice, 0.5)")).as("median_price"),
        OracleRound.round2(stddev_samp(col("o_totalprice"))).as("sd"),
        OracleRound.roundN(corr(col("o_totalprice"), col("o_custkey")), 4).as("c"))
      .orderBy("o_orderstatus")

  /** TPC-H Q14-style promotion effect: lineitem ⋈ part over one shipdate
    * month, PROMO revenue share. part scales with SF (20 M rows at sf100)
    * → no broadcast hint; the shipdate filter prunes lineitem at the scan,
    * so AQE sees a small probe side and can still pick broadcast when it
    * fits. One shuffle on the part key otherwise.
    */
  def promoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-02-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_type")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(OracleRound.roundN(
        lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) /
          sum(rev), 4).as("promo_pct"))
  }

  /** TPC-H Q9-style: revenue by (nation, brand) through the full
    * part ⋈ lineitem ⋈ supplier ⋈ nation star. Both SF-scaled dimensions
    * (part, supplier) joined WITHOUT hints — lineitem shuffles on each
    * fact-side key, nation broadcasts.
    */
  def brandVolumeByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, sfDir)
      .where(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select("p_partkey", "p_brand")
    val sup = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val nation = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("p_brand"))
      .agg(OracleRound.roundN(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("n_name", "p_brand")
  }

  /** TPC-H Q7-style: bilateral trade volume between two nations by ship
    * year — supplier nation × customer nation through the full
    * lineitem ⋈ orders ⋈ customer ⋈ supplier star, both directions. The
    * nation dim is pre-filtered to the two names BEFORE the join (so the
    * broadcast carries 2 rows) and the cross-pair condition applies after.
    */
  def nationTradeVolume(
      spark: SparkSession, sfDir: String,
      n1: String = "NATION_1", n2: String = "NATION_2"): DataFrame = {
    val nations = Tables.nation(spark, sfDir)
      .where(col("n_name").isin(n1, n2))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(spark, sfDir).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"),
        year(col("l_shipdate")).as("l_year"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nations.select(col("n_nationkey").as("sk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sk"))
      .join(broadcast(nations.select(col("n_nationkey").as("ck"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("ck"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(OracleRound.roundN(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Correlated-style aggregate filter: orders above their customer's
    * average order value (self-join on a pre-aggregated side).
    */
  def aboveCustomerAverage(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val avgByCust = ord.groupBy(col("o_custkey").as("k"))
      .agg(avg(col("o_totalprice")).as("avg_price"))
    ord.join(avgByCust, col("o_custkey") === col("k"))
      .where(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** TPC-H Q18-style HAVING filter: orders whose total lineitem quantity
    * exceeds a threshold, joined back to the order header. The aggregate
    * runs FIRST (partial-agg shuffle on orderkey) and the having filter
    * shrinks it to a sliver before the header join — at 100 TB the join
    * input is the qualifying keys only, never the full fact table twice.
    */
  def bigQuantityOrders(
      spark: SparkSession,
      sfDir: String,
      minQty: Double = 150.0): DataFrame = {
    val qty = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(OracleRound.roundN(sum(col("l_quantity")), 2).as("total_qty"))
      .where(col("total_qty") > minQty)
    Tables.orders(spark, sfDir)
      .join(qty, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("total_qty"))
      .orderBy("o_orderkey")
  }

  /** Distinct-count aggregation (TPC-H Q16 shape): distinct suppliers and
    * parts per brand. count(DISTINCT x) expands to a two-phase plan
    * (dedup shuffle on (group, x), then count) — partial aggregation on
    * both phases, no row ever carries more than the two keys.
    */
  def brandSupplierCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("p_brand")

  /** TPC-H Q4 shape (adapted — this schema has no commitdate, so "late" =
    * shipped after the order date): order counts per priority where at
    * least one lineitem shipped late. The EXISTS plans as a left-semi join
    * carrying the non-equi shipdate condition; the probe side is pruned to
    * two columns, and the semi join never duplicates order rows, so the
    * downstream aggregate sees each order once regardless of lineitem
    * fan-out — at 100 TB the shuffle carries (orderkey, shipdate) pairs
    * only.
    */
  def latePriorityCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6 shape: forecasting-revenue-change — a single filtered scan
    * with every predicate pushable to parquet (shipdate range + discount
    * band + quantity cap all appear as PushedFilters) and a scalar
    * aggregate on top. The canonical "is the scan doing the work" probe:
    * no join, no window, one partial-agg exchange of exactly one row per
    * partition.
    */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(OracleRound.roundN(
        sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** TPC-H Q12 shape (adapted — l_linestatus stands in for the missing
    * shipmode column): per line status over one ship year, how many lines
    * belong to high-priority vs other orders. Conditional aggregation
    * (sum of CASE) folds into the partial aggregate — one shuffle on the
    * single grouping key after the fact⋈fact join on orderkey.
    */
  def lineStatusPriorityCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linestatus")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q13 shape: distribution of customers by order count. Two
    * stacked aggregations — the first shuffles on custkey (wide), the
    * second on the tiny count domain — after a left outer join that keeps
    * zero-order customers. At scale the second exchange is negligible:
    * its input is one row per customer and its key domain is the handful
    * of distinct order counts.
    */
  def orderCountDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    Tables.customer(spark, sfDir).select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q17 shape: revenue from small-quantity lineitems of one brand,
    * where "small" means under 20% of that part's average quantity. The
    * brand filter shrinks part BEFORE both joins, the per-part average is
    * computed over the already-filtered lineitems (one partial-agg
    * shuffle on partkey), and the self-join is sliver ⋈ sliver — the
    * full lineitem table is scanned once, never twice. l_quantity is
    * integral in this data, so the per-part mean is an exact
    * integer-sum / count in both engines (no accumulation-order drift at
    * the 0.2×avg threshold compare).
    */
  def smallQuantityRevenue(
      spark: SparkSession, sfDir: String, brand: String = "Brand#5"): DataFrame = {
    val parts = Tables.part(spark, sfDir)
      .where(col("p_brand") === brand).select("p_partkey")
    val branded = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(parts, col("l_partkey") === col("p_partkey"))
    val qtyLimit = branded
      .groupBy(col("l_partkey").as("ak"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_limit"))
    branded.join(qtyLimit, col("l_partkey") === col("ak"))
      .where(col("l_quantity") < col("qty_limit"))
      .agg(OracleRound.roundN(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** TPC-H Q19 shape: disjunctive multi-attribute predicate — three OR'd
    * (brand, size-range, quantity-range) clauses across the part⋈lineitem
    * join. Catalyst extracts the common `p_partkey` equi-condition so the
    * join stays hash-based (PlanSpec forbids the cartesian fallback), and
    * pushes the brand/size disjunction down to the part scan.
    */
  def disjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_brand", "p_size")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 40)))
      .agg(OracleRound.roundN(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** TPC-H Q22 shape: high-balance customers with no RECENT orders
    * (none since the cutoff date), summarized per market segment. The
    * global "average positive balance" scalar is a one-row aggregate
    * broadcast into the filter (never a driver-side collect), and the
    * NOT EXISTS is a left-anti join against the date-filtered custkey
    * column of orders — the filter prunes the anti-join build side at
    * the scan.
    */
  def dormantHighValueCustomers(
      spark: SparkSession, sfDir: String,
      cutoff: String = "2000-01-01"): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val avgBal = cust.where(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("ab"))
    val ordCust = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
      .select("o_custkey")
    cust.join(broadcast(avgBal))
      .where(col("c_acctbal") > col("ab"))
      .join(ordCust, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_cust"),
        OracleRound.roundN(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q10 shape: revenue lost to returned items per customer over one
    * order quarter, top-k. The returnflag filter prunes lineitem at the
    * scan, the date filter prunes orders; customer joins AFTER the
    * aggregate would be ideal but the group key needs c_name/n_name —
    * instead customer (SF-scaled, no hint) joins pre-agg and nation
    * broadcasts. Top-k via TakeOrderedAndProject.
    */
  def returnedItemRevenue(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val nation = Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(OracleRound.roundN(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** TPC-H Q3 shape: unshipped-order revenue for one market segment —
    * the classic customer×orders×lineitem star with date predicates on
    * BOTH fact sides (ordered before the cutoff, shipped after), top-k
    * orders by revenue. Revenue is rounded BEFORE the ranking (the
    * cross-engine rank-order discipline) and ties break on
    * (o_orderdate, l_orderkey). The testdata carries no o_shippriority
    * column, so o_orderpriority stands in for the output attribute.
    * Scale shape: segment + date filters reach the scans, the
    * orders⋈lineitem join shuffles on the order key, the aggregate is
    * per-order (map-side partial), and the top-k is a TakeOrdered —
    * never a global sort.
    */
  def shippingPriorityRevenue(
      spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val cutoff = lit("1997-03-15").cast("timestamp")
    val cust = Tables.customer(spark, sfDir)
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(OracleRound.roundN(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(k)
  }

  /** TPC-H Q15 shape: the supplier(s) with the maximum 3-month revenue —
    * a per-supplier aggregate joined against its own one-row max (the
    * broadcast-scalar pattern; never a driver-side collect). The equality
    * compare is on the ROUNDED revenue, identical in both engines.
    */
  def topSupplierRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(OracleRound.roundN(
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(mx))
      .where(col("total_revenue") === col("mx"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q21 shape (adapted — "late" = shipped after the order date):
    * suppliers who were the ONLY late shipper on a multi-supplier order.
    * One fact⋈fact join carries the late flag; then TWO stacked plain
    * aggregates: (order, supplier) → any-late (the dedup level), and
    * order → supplier count / late count / the lone late supplier. Both
    * quantifiers come out of the second aggregate — no EXISTS re-scan of
    * lineitem, and no countDistinct (which would plan an Expand and
    * triple the shuffle volume; the stacked form benched 2× faster).
    */
  def soloLateSuppliers(spark: SparkSession, sfDir: String, k: Int = 25): DataFrame = {
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val perSupp = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") > col("o_orderdate"), 1).otherwise(0)).as("late"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(col("late")).as("n_late_supp"),
        max(when(col("late") === 1, col("l_suppkey"))).as("late_supp"))
      .where(col("n_supp") > 1 && col("n_late_supp") === 1)
    perOrder.groupBy(col("late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_name"),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(k)
  }

  /** TPC-H Q2 shape (adapted — this schema has no partsupp, so lineitem
    * is the part⋈supplier supply relation): for each qualifying part, the
    * REGIONAL supplier offering the minimum unit cost. The classic
    * correlated MIN subquery (`cost = (SELECT min(cost) ... WHERE
    * partkey = outer.partkey)`) is decorrelated into an aggregate +
    * equality join-back — the Spark-first spelling that runs as two
    * partial-agg shuffles on the part key instead of a per-row re-scan.
    * Unit cost is rounded PER ROW (OracleRound — a fixed IEEE op
    * sequence, bit-identical cross-engine) so the min and the
    * equality join-back compare stable values; ties on the minimum
    * break to the lowest supplier key. Both semi-join reducers prune
    * the fact scan: nation (fixed-size) broadcasts; the supplier and
    * part reducers are SF-scaled so AQE picks their join strategy.
    */
  def minCostSupplier(
      spark: SparkSession, sfDir: String, regionKey: Int = 3,
      pType: String = "LARGE", maxSize: Int = 15): DataFrame = {
    val regionalSupp = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, sfDir)
        .where(col("n_regionkey") === regionKey).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("rsk"))
    val qualParts = Tables.part(spark, sfDir)
      .where(col("p_type") === pType && col("p_size") <= maxSize)
      .select("p_partkey")
    val supply = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        OracleRound.round2(col("l_extendedprice") / col("l_quantity")).as("cost"))
      .join(regionalSupp, col("l_suppkey") === col("rsk"), "left_semi")
      .join(qualParts, col("l_partkey") === col("p_partkey"), "left_semi")
    val perPair = supply.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("cost")).as("cost"))
    val perPart = perPair.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("cost")).as("min_cost"))
    perPair
      .join(perPart, col("l_partkey") === col("mk") && col("cost") === col("min_cost"))
      .groupBy(col("l_partkey").as("p_partkey"), col("min_cost"))
      .agg(min(col("l_suppkey")).as("s_suppkey"))
      .join(Tables.supplier(spark, sfDir)
        .select(col("s_suppkey").as("sk"), col("s_name")),
        col("s_suppkey") === col("sk"))
      .select("p_partkey", "s_suppkey", "s_name", "min_cost")
      .orderBy("p_partkey")
  }

  /** TPC-H Q8 shape: one nation's share of a regional market, per order
    * year — the full customer-side star (lineitem ⋈ orders ⋈ customer ⋈
    * nation) times the supplier-side star (⋈ supplier ⋈ nation) with a
    * part-type filter. The region/type reducers are SEMI-joins applied
    * before the fact⋈fact join so lineitem shrinks at the earliest
    * exchange; fixed-size nation broadcasts, SF-scaled supplier/part get
    * no hint. The share is a conditional-sum ratio rounded once at the
    * output edge (round4 — double-sum drift is ~1e-12 relative, far
    * below the printed precision).
    */
  def marketShare(
      spark: SparkSession, sfDir: String, supplierNation: String = "NATION_7",
      custRegionKey: Int = 2, pType: String = "STANDARD"): DataFrame = {
    val regionNations = broadcast(Tables.nation(spark, sfDir)
      .where(col("n_regionkey") === custRegionKey).select("n_nationkey"))
    val regionCust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey")
      .join(regionNations, col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .join(regionCust, col("o_custkey") === col("c_custkey"), "left_semi")
    val suppNation = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val typedParts = Tables.part(spark, sfDir)
      .where(col("p_type") === pType).select("p_partkey")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(typedParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(OracleRound.round4(
        lit(100.0) * sum(when(col("supp_nation") === supplierNation, rev)
          .otherwise(0.0)) / sum(rev)).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q11 shape: groups whose value exceeds a FRACTION OF THE GLOBAL
    * TOTAL — the scalar subquery in the HAVING clause, decorrelated into
    * a one-row aggregate broadcast into the filter (never a driver-side
    * collect). Adapted to shipped quantity through one region's
    * suppliers; l_quantity is integral, so both the per-part sums and
    * the `qty * 1000 > total` threshold are exact integer arithmetic in
    * any engine — no rounding epsilon at the cut boundary.
    */
  def importantParts(
      spark: SparkSession, sfDir: String, regionKey: Int = 1,
      perMille: Int = 1): DataFrame = {
    val regionSupp = Tables.supplier(spark, sfDir)
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, sfDir)
        .where(col("n_regionkey") === regionKey).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val v = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(regionSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val tot = v.agg(sum(col("qty")).as("tot"))
    v.join(broadcast(tot))
      .where(col("qty") * lit(1000) > col("tot") * lit(perMille))
      .select(col("l_partkey").as("p_partkey"), col("qty").cast("long").as("qty"))
      .orderBy(col("qty").desc, col("p_partkey"))
  }

  /** TPC-H Q16 shape: distinct-supplier counts per part attribute group,
    * with a NOT IN supplier exclusion list. The NOT IN is a left-anti
    * join; the distinct count is a pre-aggregation DISTINCT on
    * (brand, type, size, suppkey) followed by a plain count — never
    * `countDistinct`, whose Expand would multiply the shuffle volume
    * (PlanSpec forbids it on fact-table plans). The supplier⋈part pair
    * relation is deduplicated FIRST so every downstream stage works on
    * the collapsed pair set, not raw lineitems.
    */
  def supplierCountsByPartAttrs(
      spark: SparkSession, sfDir: String,
      excludePattern: String = "%3",
      sizes: Seq[Int] = Seq(1, 5, 9, 13, 17, 21)): DataFrame = {
    val excluded = Tables.supplier(spark, sfDir)
      .where(col("s_name").like(excludePattern)).select("s_suppkey")
    val pairs = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
    val parts = Tables.part(spark, sfDir)
      .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    pairs.join(parts, col("l_partkey") === col("p_partkey"))
      .select("p_brand", "p_type", "p_size", "l_suppkey").distinct()
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q20 shape: suppliers who shipped MORE THAN HALF of a
    * qualifying part's annual volume — the nested correlated-subquery
    * chain (`IN (parts) ... > (SELECT half the part's total)`)
    * decorrelated into a per-part total joined back against the
    * per-(part, supplier) sum. Quantities are integral, so `qty * 2 >
    * total` is exact; the name-pattern part reducer semi-joins before
    * the aggregate so only qualifying lineitems reach the exchange.
    */
  def dominantShippers(
      spark: SparkSession, sfDir: String, namePattern: String = "red%",
      year: String = "1997"): DataFrame = {
    val qualParts = Tables.part(spark, sfDir)
      .where(col("p_name").like(namePattern)).select("p_partkey")
    val ship = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year.toInt + 1}-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(qualParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    val tot = ship.groupBy(col("l_partkey").as("tk"))
      .agg(sum(col("qty")).as("tot"))
    ship
      .join(tot, col("l_partkey") === col("tk") && col("qty") * 2 > col("tot"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominated"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "n_dominated")
      .orderBy("s_suppkey")
  }

  /** Window-frame surface: per-user running signals over the event stream —
    * a ROWS-frame moving average, a lag delta, and a running maximum.
    * Partitioned by user_id (many partitions at scale — never a global
    * window); each frame is O(1) state per row.
    */
  def movingAverages(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val mw = w.rowsBetween(-2, Window.currentRow)
    val rw = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(
        col("event_id"), col("user_id"), col("value"),
        OracleRound.roundN(avg(col("value")).over(mw), 2).as("mavg3"),
        OracleRound.roundN(col("value") - lag(col("value"), 1).over(w), 2).as("delta"),
        OracleRound.roundN(max(col("value")).over(rw), 2).as("running_max"))
      .orderBy("event_id")
  }

  /** Rank-statistics windows: percent_rank / cume_dist / quartile of each
    * order within its customer. The compound (price, orderkey) ordering
    * makes every rank deterministic; partitioning by custkey keeps one
    * small frame per customer at any scale.
    */
  def orderPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        OracleRound.roundN(percent_rank().over(w), 6).as("pct_rank"),
        OracleRound.roundN(cume_dist().over(w), 6).as("cume"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_orderkey")
  }

  /** Rolling 7-day distinct users via MERGEABLE HLL sketches — the
    * pattern that makes sliding-window distinct counts feasible at scale:
    * distinct counts don't add (Σ per-day distincts overcounts returning
    * users), but HLL registers MERGE, so the corpus is scanned ONCE into
    * per-day sketches and every window is a union of 7 tiny sketches.
    * The exact side (re-deduplicating (window, user) for every window —
    * 7× the pair volume through a distinct agg) is computed here only as
    * the verification gate; at 100 TB it is precisely what you can no
    * longer afford, and the sketch path is what remains.
    *
    * Sketch VALUES are engine-specific, so (same convention as
    * `approx_distinct_users`) the hash-compared output carries the exact
    * count plus a boolean pinning the estimate within the published
    * HLL tolerance (lgK=12 → rsd ≈ 1.6%; gate at 5×rsd ≈ 8%). The rsd
    * is a standard deviation, not a hard bound, so the boolean is
    * PROBABILISTIC once the sketch leaves its exact sparse range — 5σ
    * makes a flip vanishingly unlikely (a 3σ gate leaves ~0.3% of
    * windows legitimately outside); if a larger-SF oracle run ever flips
    * a window, re-pin rather than widen blindly.
    */
  def rollingDistinctUsersHll(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val observed = e.select(col("day")).distinct()
      .select(col("day").as("wday"))
    // each day's (pairs, sketch) contribute to windows d .. d+6
    val daySketch = e.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val est = daySketch
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"),
        col("sk"))
      .join(observed, Seq("wday"))
      .groupBy(col("wday"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = e
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"),
        col("user_id"))
      .join(observed, Seq("wday"))
      .groupBy(col("wday"))
      .agg(countDistinct(col("user_id")).as("exact_users_7d"))
    exact.join(est, Seq("wday"))
      .select(
        date_format(col("wday"), "yyyy-MM-dd").as("day"),
        col("exact_users_7d"),
        (abs(col("est") - col("exact_users_7d")).cast("double") /
          col("exact_users_7d") <= 0.08).as("hll_within_tol"))
      .orderBy("day")
  }
}

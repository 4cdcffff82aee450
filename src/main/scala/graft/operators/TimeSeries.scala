package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.OracleRound

/** Time-series primitives over irregular (gapped) daily series — the
  * resample / gap-fill / interpolate / rolling-window / decay-average
  * toolkit a metrics or feature-engineering pipeline needs once events
  * are bucketed to a calendar.
  *
  * Design notes for 100 TB:
  *   - Every window is PARTITIONED by the series key; no unpartitioned
  *     (single-reducer) windows anywhere. Series count scales out, series
  *     LENGTH is bounded by the calendar span (a year of days is 365 rows
  *     per key), which is what makes per-key windows and per-row prefix
  *     folds safe at any corpus size.
  *   - The calendar spine is generated (`sequence`), never read, and is
  *     broadcast against the (large) key side, so gap-filling adds no
  *     extra shuffle beyond the per-key aggregation that built the series.
  *   - Cross-engine determinism: daily aggregates that feed arithmetic
  *     are either order-independent (`count`, `max`) or snapped to an
  *     exact integer grid (revenue in CENTS as BIGINT) before any
  *     summation, so window sums are exact integer math; interpolation
  *     and EWMA are written as the same IEEE-double expression / the same
  *     sequential fold in both engines.
  *
  * No counterpart in the reference (its only time semantics is the
  * streaming window of srapk_structure_streaming.py:150-160); this is the
  * batch-side completion of that axis.
  */
object TimeSeries {

  /** Analysis window — intentionally narrow so the per-key series is
    * visibly gapped at small SFs (sparse series exercise the fill paths).
    */
  private val lo = "1997-01-01"
  private val hi = "1997-02-28"

  private def ordersInWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit("1997-03-01").cast("timestamp"))

  /** Per-(priority, day) base series. `max` (not `avg`/`sum`) is the daily
    * value so the base is bit-deterministic regardless of aggregation
    * order; revenue snaps EACH price to integer cents BEFORE the daily
    * sum, so the aggregate is a sum of longs — exact and order-
    * independent, never a double fold whose rounding could differ across
    * engines or partitionings.
    */
  private def dailySeries(spark: SparkSession, sfDir: String): DataFrame =
    ordersInWindow(spark, sfDir)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(
        count(lit(1)).as("n_orders"),
        max(col("o_totalprice")).as("v_raw"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("rev_cents"))

  /** Gap-fill + fill strategies in one pass: the (priority × calendar)
    * spine left-joins the observed series, then per-key ordered windows
    * derive last-observation-carried-forward, next-observation-carried-
    * backward, and exact linear interpolation between the surrounding
    * observations. Interior nulls get all three; leading/trailing nulls
    * keep LOCF/NOCB null on the open side (no extrapolation).
    *
    * The carried observation is a (day, value) STRUCT through
    * `last/first(..., ignoreNulls)` so the interpolation knows the
    * neighbor's distance, not just its value — one window pair, no
    * self-join against the non-null subset.
    */
  def dailyInterpolated(spark: SparkSession, sfDir: String): DataFrame = {
    val series = dailySeries(spark, sfDir)
    val days = spark.range(1)
      .select(explode(sequence(
        lit(lo).cast("date"), lit(hi).cast("date"),
        expr("interval 1 day"))).as("day"))
    val keys = ordersInWindow(spark, sfDir)
      .select(col("o_orderpriority").as("priority")).distinct()
    // keys is the scale side (unbounded key count); the generated
    // calendar is constant-size — broadcast it.
    val spine = keys.crossJoin(broadcast(days))
    val base = spine.join(series, Seq("priority", "day"), "left")

    val wPrev = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = when(col("v_raw").isNotNull,
      struct(col("day").as("d"), col("v_raw").as("v")))
    val prev = last(obs, ignoreNulls = true).over(wPrev)
    val nxt = first(obs, ignoreNulls = true).over(wNext)

    // identical IEEE expression shape in the oracle:
    //   prev.v + (nxt.v - prev.v) * datediff / datediff
    val interp = when(col("v_raw").isNotNull, col("v_raw"))
      .when(prev.isNotNull && nxt.isNotNull,
        prev.getField("v") +
          (nxt.getField("v") - prev.getField("v")) *
          datediff(col("day"), prev.getField("d")) /
          datediff(nxt.getField("d"), prev.getField("d")))

    base.select(
      col("priority"),
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      coalesce(col("n_orders"), lit(0L)).as("n_orders"),
      OracleRound.roundN(col("v_raw"), 6).as("v_raw"),
      OracleRound.roundN(prev.getField("v"), 6).as("v_locf"),
      OracleRound.roundN(nxt.getField("v"), 6).as("v_nocb"),
      OracleRound.roundN(interp, 6).as("v_interp"))
      .orderBy("priority", "day")
  }

  /** Rolling 7-day revenue per series via a RANGE window over the day
    * offset — RANGE, not ROWS: the series is sparse, so "the last seven
    * calendar days" is NOT "the last seven observations". Revenue stays
    * in integer cents through the window sum (exact associative math),
    * surfacing as dollars only at the edge.
    */
  def rollingRange(spark: SparkSession, sfDir: String): DataFrame = {
    val series = dailySeries(spark, sfDir)
      .withColumn("d_off", datediff(col("day"), lit(lo).cast("date")))
    val w7 = Window.partitionBy(col("priority")).orderBy(col("d_off"))
      .rangeBetween(-6, 0)
    series.select(
      col("priority"),
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      (col("rev_cents") / 100.0).as("daily_rev"),
      (sum(col("rev_cents")).over(w7) / 100.0).as("roll7_rev"),
      sum(col("n_orders")).over(w7).as("roll7_orders"),
      count(lit(1)).over(w7).as("roll7_days"))
      .orderBy("priority", "day")
  }

  /** Irregular-gap exponential decay average over the observed (gapped)
    * series, one-day half-life: with gap g days between consecutive
    * observations the carry weight is 2^{-g}, i.e.
    * y_i = w·y_{i-1} + (1-w)·v_i with w = 2^{-gap} — the standard
    * irregular-spacing EWMA generalization (a day of silence decays
    * exactly like an observed step). The weight is computed as
    * 1.0 / (1L << gap) — an exact power of two — rather than `pow`,
    * because `pow` is only 1-ulp-accurate and its last bit differs
    * between libm implementations; integer shift + division is
    * bit-identical in every engine.
    *
    * The running value is a SEQUENTIAL fold over the per-key prefix
    * (sorted (d_off, v) structs collected by an ordered per-key window,
    * folded with `aggregate`), so both engines associate identically and
    * the result is bit-deterministic. Per-row prefix folding is O(L²) in
    * the series length — safe here because L is calendar-bounded (≤ 59);
    * an unbounded-history production variant would keep the same fold but
    * run it once per key in a single ordered pass (or checkpoint the
    * running state, as the streaming stats sink does).
    */
  def ewma(spark: SparkSession, sfDir: String): DataFrame = {
    val series = dailySeries(spark, sfDir)
      .withColumn("d_off", datediff(col("day"), lit(lo).cast("date")))
    val wPrefix = Window.partitionBy(col("priority")).orderBy(col("d_off"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // explicit array_sort: struct ordering is (d_off, v) lexicographic and
    // d_off is unique per key, so the fold order is pinned, not inherited
    // from frame iteration order.
    val prefix = array_sort(
      collect_list(struct(col("d_off").as("d"), col("v_raw").as("v")))
        .over(wPrefix))
    val folded = aggregate(
      slice(prefix, lit(2), greatest(size(prefix) - 1, lit(0))),
      element_at(prefix, 1),
      (acc, s) => {
        val w = lit(1.0) /
          call_function("shiftleft", lit(1L),
            s.getField("d") - acc.getField("d")).cast("double")
        struct(s.getField("d").as("d"),
          (w * acc.getField("v") + (lit(1.0) - w) * s.getField("v")).as("v"))
      })
    series.select(
      col("priority"),
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      OracleRound.roundN(col("v_raw"), 6).as("v_raw"),
      OracleRound.roundN(folded.getField("v"), 6).as("ewma"))
      .orderBy("priority", "day")
  }

  /** Robust rolling-MAD anomaly flags over the zero-filled daily
    * order-count series: each day is scored against the TRAILING 14-day
    * history (exclusive of itself — scoring a point against a window that
    * contains it dilutes the very outlier being tested), flagged when
    * |x − median| > 3.5·MAD, the standard robust z-score rule. Median/MAD
    * instead of mean/stddev because a burst in the history window would
    * inflate a stddev and mask the next burst; the breakdown point of the
    * median keeps the baseline honest.
    *
    * Exactness: the frame is collected as a SORTED integer array (≤ 14
    * elements, calendar-bounded) and both medians are taken as the SUM of
    * the two middle elements — m2 = 2·median and mad4 = 4·MAD stay
    * integers, so the flag `4·|2x − m2| > 7·mad4` (⇔ |x−med| > 3.5·MAD)
    * is pure integer comparison, bit-identical across engines; the
    * surfaced median/MAD are single IEEE divisions of those integers.
    * Days with under 8 trailing observations are warm-up (flag NULL).
    * Shape: one partial-agg to the day grain + per-key ordered windows
    * over calendar-bounded frames — series count scales out, frames never
    * grow with data volume.
    */
  /** The zero-filled (priority, day, n) daily order-count series on the
    * broadcast calendar spine — the shared input of [[anomalies]],
    * [[acf]], [[seasonalDecompose]] and [[cusum]] (a missing day IS a
    * zero-order day; skipping it would shift every window).
    */
  private def zeroFilledDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val series = dailySeries(spark, sfDir)
    val days = spark.range(1)
      .select(explode(sequence(
        lit(lo).cast("date"), lit(hi).cast("date"),
        expr("interval 1 day"))).as("day"))
    val keys = ordersInWindow(spark, sfDir)
      .select(col("o_orderpriority").as("priority")).distinct()
    keys.crossJoin(broadcast(days))
      .join(series.select(col("priority"), col("day"), col("n_orders")),
        Seq("priority", "day"), "left")
      .select(col("priority"), col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n"))
  }

  def anomalies(spark: SparkSession, sfDir: String): DataFrame = {
    val filled = zeroFilledDaily(spark, sfDir)

    val w = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(-14, -1)
    val hist = array_sort(collect_list(col("n")).over(w))
    val cnt = size(hist)
    // 1-based two-middle indices: lower = (cnt+1)/2, upper = cnt/2 + 1
    val loIdx = floor((cnt + lit(1)) / lit(2)).cast("int")
    val hiIdx = floor(cnt / lit(2)).cast("int") + lit(1)
    val m2 = element_at(hist, loIdx) + element_at(hist, hiIdx)
    val sdev = array_sort(transform(hist, v => abs(v * lit(2L) - m2)))
    val mad4 = element_at(sdev, loIdx) + element_at(sdev, hiIdx)
    val warm = cnt >= 8
    // Two-stage projection: the window expressions order by `day`, so the
    // date_format re-alias of `day` MUST live in a later select — putting
    // both in one projection makes the window resolve the lateral alias
    // (AnalysisException UNSUPPORTED_FEATURE.LATERAL_COLUMN_ALIAS_IN_WINDOW).
    filled.select(
      col("priority"), col("day"), col("n"),
      when(warm, m2 / 2.0).as("med"),
      when(warm, mad4 / 4.0).as("mad"),
      when(warm,
        abs(col("n") * lit(2L) - m2) * lit(4L) > mad4 * lit(7L))
        .as("is_anomaly"))
      .select(
        col("priority"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n").as("n_orders"),
        col("med"), col("mad"), col("is_anomaly"))
      .orderBy("priority", "day")
  }

  /** Autocorrelation function of the zero-filled daily order-count series
    * at lags 1..7 — the "is there a weekly pulse" diagnostic that decides
    * whether [[seasonalDecompose]]'s day-of-week component is even the
    * right model. Standard sample ACF: r_k = Σ(x_t−x̄)(x_{t−k}−x̄) /
    * Σ(x_t−x̄)², expanded so every aggregate is an exact INTEGER sum
    * (Σx_t·x_{t−k}, the two marginal lag-window sums, Σx, Σx², counts)
    * and the ratio is ONE double expression over those integers — the
    * identical IEEE tree on both engines, so 6-dp rounding hash-matches.
    *
    * Shape: the lag dimension is 7 map-side projections of the series
    * unioned (no join-condition arithmetic, no nested loop); pair
    * formation is an equi-join on (priority, day-offset) against a
    * calendar-bounded frame, and everything downstream is one
    * partial-agg per (priority, lag) plus a per-priority moment agg —
    * series count scales out, frames never grow with data volume.
    */
  def acf(spark: SparkSession, sfDir: String): DataFrame = {
    val filled = zeroFilledDaily(spark, sfDir)
      .select(col("priority"),
        datediff(col("day"), lit(lo).cast("date")).as("d_off"),
        col("n"))

    val lagged = (1 to 7).map { k =>
      filled.select(col("priority"),
        (col("d_off") + lit(k)).as("d_off"),
        col("n").as("n_lag"), lit(k).as("lag"))
    }.reduce(_ unionByName _)
    val pairs = filled.join(lagged, Seq("priority", "d_off"))
      .groupBy(col("priority"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("n") * col("n_lag")).as("spp"),
        sum(col("n")).as("s1"),
        sum(col("n_lag")).as("s2"))
    val moments = filled.groupBy(col("priority"))
      .agg(count(lit(1)).as("n_tot"),
        sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("sxx"))

    val xbar = col("s").cast("double") / col("n_tot")
    val num = col("spp") - xbar * (col("s1") + col("s2")) +
      col("n_pairs") * (xbar * xbar)
    val den = col("sxx") - col("n_tot") * (xbar * xbar)
    pairs.join(moments, Seq("priority"))
      .select(col("priority"), col("lag"), col("n_pairs"),
        OracleRound.roundN(num / den, 6).as("acf"))
      .orderBy("priority", "lag")
  }

  /** Additive seasonal decomposition of the daily order-count series:
    * per (priority, calendar day), `n_orders = trend + seasonal + resid`
    * where trend is the centered 7-day moving average, seasonal the
    * day-of-week deviation from each series' own mean, and resid what's
    * left — the classic telemetry that turns "volume moved" into "is
    * that the weekday pattern or an anomaly". Zero-filled on the
    * broadcast calendar spine first (a missing day IS a zero-order day —
    * skipping it would shift every window).
    *
    * Every component is derived from INTEGER sums by single IEEE
    * divisions (centered mean = windowed long sum / window count;
    * seasonal = dow mean − series mean), and the residual subtracts the
    * already-6dp-rounded components — identical expression trees on both
    * engines, so the hash compare is exact, never tolerance-based.
    * Shape: one partial-agg to the day grain, then windows partitioned
    * by priority over CALENDAR-sized frames; the spine is a broadcast
    * constant (bounded BNLJ family), never a shuffle of the fact table.
    */
  def seasonalDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    val filled = zeroFilledDaily(spark, sfDir)

    val wTrend = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val trend = sum(col("n")).over(wTrend).cast("double") /
      count(lit(1)).over(wTrend)
    val wDow = Window.partitionBy(col("priority"), dayofweek(col("day")))
    val wAll = Window.partitionBy(col("priority"))
    val seasonal = sum(col("n")).over(wDow).cast("double") /
      count(lit(1)).over(wDow) -
      sum(col("n")).over(wAll).cast("double") / count(lit(1)).over(wAll)

    val trendR = OracleRound.roundN(trend, 6)
    val seasonalR = OracleRound.roundN(seasonal, 6)
    // Same two-stage shape as [[anomalies]]: window columns first, the
    // `day` re-alias second, so the windows never see a lateral alias.
    filled.select(
      col("priority"), col("day"), col("n"),
      trendR.as("trend"),
      seasonalR.as("seasonal"),
      OracleRound.roundN(col("n") - trendR - seasonalR, 6).as("resid"))
      .select(
        col("priority"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n").as("n_orders"),
        col("trend"), col("seasonal"), col("resid"))
      .orderBy("priority", "day")
  }

  /** Two-sided CUSUM changepoint statistics over a zero-filled daily
    * series — the sustained-shift detector beside [[anomalies]]' pointwise
    * MAD flags (one burst day never alarms CUSUM; a run of elevated days
    * never alarms MAD — a monitoring stack wants both). Page's scheme
    * against the series' own mean μ with allowance μ/2, kept EXACTLY
    * integer by scaling to 2n units (n = series length, S = Σx, so
    * μ = S/n and the per-day increments are 2n·x−3S upward, S−2n·x
    * downward): U_t = max(0, U_{t−1} + 2n·x_t − 3S) accumulates excess
    * over 1.5μ, D_t the mirror below 0.5μ, and the alarm fires when a
    * statistic exceeds 4S (cumulative scaled excess worth two mean-days).
    * Every value is a long — the sequential fold is bit-identical in any
    * engine, no tolerance anywhere.
    *
    * Shape: per-key windows for (n, S, ordered prefix) + a per-row fold
    * over the calendar-bounded prefix (≤ series length, the documented
    * [[ewma]] pattern; the single-pass production variant is a stateful
    * per-key scan). Series count scales out; frames never grow with data
    * volume. [[cusumFromSeries]] is the testable core over any
    * (priority, day, n) frame.
    */
  def cusumFromSeries(filled: DataFrame): DataFrame = {
    val wAll = Window.partitionBy(col("priority"))
    val wPre = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withStats = filled.select(
      col("priority"), col("day"), col("n"),
      count(lit(1)).over(wAll).as("n_tot"),
      sum(col("n")).over(wAll).as("s_tot"),
      collect_list(col("n")).over(wPre).as("pre"))
    def fold(step: Column => Column): Column =
      aggregate(col("pre"), lit(0L),
        (acc, x) => greatest(lit(0L), acc + step(x)))
    withStats
      .select(
        col("priority"), col("day"), col("n"), col("s_tot"),
        fold(x => x * lit(2L) * col("n_tot") - lit(3L) * col("s_tot"))
          .as("cusum_up"),
        fold(x => col("s_tot") - x * lit(2L) * col("n_tot"))
          .as("cusum_dn"))
      .select(
        col("priority"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n").as("n_orders"),
        col("cusum_up"), col("cusum_dn"),
        (col("cusum_up") > col("s_tot") * lit(4L)).as("up_alarm"),
        (col("cusum_dn") > col("s_tot") * lit(4L)).as("dn_alarm"))
      .orderBy("priority", "day")
  }

  def cusum(spark: SparkSession, sfDir: String): DataFrame =
    cusumFromSeries(zeroFilledDaily(spark, sfDir))

  /** Holt–Winters additive seasonal smoothing (period 7, α = 0.5,
    * β = γ = 0.25 — all dyadic, exact in binary64) over the zero-filled
    * daily series: per day the running (level, trend, seasonal[7])
    * state and the one-step-ahead forecast ℓ + b + s[next dow] — the
    * weekly-seasonality capacity forecast completing the family
    * ([[ewma]] level → [[holt]] level+trend → this). Recurrence
    * `ℓ_t = α(y_t − s_{t−7}[dow]) + (1−α)(ℓ_{t−1} + b_{t−1})`,
    * `b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)b_{t−1}`,
    * `s_t[dow] = γ(y_t − ℓ_t) + (1−γ)s_{t−7}[dow]`, initialized
    * {ℓ = y_1, b = 0, s = 0⃗} with dow = days since 1997-01-01 mod 7.
    *
    * Exactness: the [[holt]] discipline with a 7-slot seasonal array in
    * the accumulator — ℓ_t spelled out in full inside BOTH the trend
    * and seasonal updates on BOTH engines (the oracle is a recursive
    * CTE carrying a LIST(DOUBLE); DuckDB 1.0 list_reduce mutates struct
    * accumulators field-by-field, so the row-wise recursion is the safe
    * replay). Shape: per-key calendar-bounded prefix folds — series
    * scale out, frames never grow with data volume.
    */
  def holtWinters(spark: SparkSession, sfDir: String): DataFrame = {
    val filled = zeroFilledDaily(spark, sfDir)
    val epoch = lit("1997-01-01").cast("date")
    val wPrefix = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefix = array_sort(
      collect_list(struct(col("day").as("d"),
        col("n").cast("double").as("v"),
        (datediff(col("day"), epoch) % 7).as("w")))
        .over(wPrefix))
    def lNew(acc: Column, e: Column): Column =
      lit(0.5) * (e.getField("v") -
        element_at(acc.getField("s"), e.getField("w") + 1)) +
        lit(0.5) * (acc.getField("l") + acc.getField("b"))
    val folded = aggregate(
      slice(prefix, lit(2), greatest(size(prefix) - 1, lit(0))),
      struct(element_at(prefix, 1).getField("v").as("l"),
        lit(0.0).as("b"),
        array_repeat(lit(0.0), 7).as("s")),
      (acc, e) => struct(
        lNew(acc, e).as("l"),
        (lit(0.25) * (lNew(acc, e) - acc.getField("l")) +
          lit(0.75) * acc.getField("b")).as("b"),
        transform(acc.getField("s"), (x, i) =>
          when(i === e.getField("w"),
            lit(0.25) * (e.getField("v") - lNew(acc, e)) + lit(0.75) * x)
            .otherwise(x)).as("s")))
    val dow = datediff(col("day"), epoch) % 7
    filled
      .select(col("priority"), col("day"), col("n"), folded.as("st"))
      .select(
        col("priority"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n").as("n_orders"),
        OracleRound.roundN(col("st.l"), 6).as("level"),
        OracleRound.roundN(col("st.b"), 6).as("trend"),
        OracleRound.roundN(element_at(col("st.s"), dow + 1), 6).as("seasonal"),
        OracleRound.roundN(col("st.l") + col("st.b") +
          element_at(col("st.s"), pmod(dow + 1, lit(7)) + 1), 6)
          .as("forecast_next"))
      .orderBy("priority", "day")
  }

  /** Rolling-origin one-step forecast backtest: per (model, priority),
    * the MAE and RMSE of `forecast_next` against the next day's actual
    * count, for the [[holt]] and [[holtWinters]] smoothers — the eval
    * that tells a capacity planner WHICH smoother to trust, the
    * time-series sibling of the embedding evals
    * ([[Similarity.knnLabel]] / centroidAgreement). Warm-up aware: the
    * first `skip` forecasts per series are excluded (both models
    * initialize from the first observation, so day-1 errors measure
    * initialization, not the model).
    *
    * Exactness: errors are computed from the models' already-6dp-ROUNDED
    * forecast columns against exact integer actuals, then folded over
    * the day-sorted error array (zero-init sequential fold — the same
    * tree as the oracle's `list_reduce(list_prepend(0.0, …))`), so both
    * engines sum the identical doubles in the identical order; the
    * mean/sqrt on top are single ops on identical inputs. Shape:
    * per-key lead + one calendar-bounded fold — series scale out.
    */
  def forecastEval(
      spark: SparkSession, sfDir: String, skip: Int = 7): DataFrame = {
    def evalOf(model: String, out: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("priority")).orderBy(col("day"))
      val scored = out
        .withColumn("actual_next",
          lead(col("n_orders"), 1).over(w).cast("double"))
        .withColumn("rn", row_number().over(w))
        .where(col("actual_next").isNotNull && col("rn") > skip)
        .select(col("priority"), col("day"),
          (col("forecast_next") - col("actual_next")).as("err"))
      scored
        .groupBy(col("priority"))
        .agg(sort_array(collect_list(struct(col("day").as("d"),
          col("err").as("e")))).as("errs"))
        .select(
          lit(model).as("model"),
          col("priority"),
          size(col("errs")).cast("long").as("n_eval"),
          aggregate(col("errs"), lit(0.0),
            (acc, s) => acc + abs(s.getField("e"))).as("abs_sum"),
          aggregate(col("errs"), lit(0.0),
            (acc, s) => acc + s.getField("e") * s.getField("e")).as("sq_sum"))
        .select(col("model"), col("priority"), col("n_eval"),
          OracleRound.roundN(col("abs_sum") / col("n_eval"), 6).as("mae"),
          OracleRound.roundN(sqrt(col("sq_sum") / col("n_eval")), 6).as("rmse"))
    }
    evalOf("holt", holt(spark, sfDir))
      .unionByName(evalOf("holt_winters", holtWinters(spark, sfDir)))
  }

  /** Holt's linear-trend smoothing over the zero-filled daily
    * order-count series (α = 0.5, β = 0.25 — dyadic literals, exact in
    * binary64): per day the running (level, trend) state and the
    * one-step-ahead forecast ℓ + b — the short-horizon capacity
    * forecast beside [[ewma]]'s level-only smoother. Recurrence
    * `ℓ_t = α·y_t + (1−α)(ℓ_{t−1} + b_{t−1})`,
    * `b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)b_{t−1}`, initialized
    * {ℓ = y_1, b = 0}.
    *
    * Exactness: the fold runs over the per-key ordered prefix (the
    * [[ewma]] machinery — explicitly sorted struct array,
    * calendar-bounded ≤ 59 elements) and the oracle replays the
    * IDENTICAL IEEE expression tree as a recursive CTE marching the
    * calendar (NOT list_reduce: DuckDB 1.0 mutates struct accumulators
    * field-by-field, so a trend expression reading acc.l would see the
    * already-updated level) — ℓ_t is spelled out twice inside the
    * trend update on BOTH engines rather than bound to a local, so the
    * doubles stay bit-identical and 6-dp rounding hash-matches. Shape:
    * per-key ordered windows over calendar-bounded frames — series
    * count scales out, frames never grow with data volume.
    */
  def holt(spark: SparkSession, sfDir: String): DataFrame = {
    val filled = zeroFilledDaily(spark, sfDir)
    val wPrefix = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prefix = array_sort(
      collect_list(struct(col("day").as("d"), col("n").cast("double").as("v")))
        .over(wPrefix))
    def lNew(acc: Column, s: Column): Column =
      lit(0.5) * s.getField("v") +
        lit(0.5) * (acc.getField("l") + acc.getField("b"))
    val folded = aggregate(
      slice(prefix, lit(2), greatest(size(prefix) - 1, lit(0))),
      struct(element_at(prefix, 1).getField("v").as("l"), lit(0.0).as("b")),
      (acc, s) => struct(
        lNew(acc, s).as("l"),
        (lit(0.25) * (lNew(acc, s) - acc.getField("l")) +
          lit(0.75) * acc.getField("b")).as("b")))
    filled
      .select(col("priority"), col("day"), col("n"), folded.as("st"))
      .select(
        col("priority"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n").as("n_orders"),
        OracleRound.roundN(col("st.l"), 6).as("level"),
        OracleRound.roundN(col("st.b"), 6).as("trend"),
        OracleRound.roundN(col("st.l") + col("st.b"), 6).as("forecast_next"))
      .orderBy("priority", "day")
  }
}

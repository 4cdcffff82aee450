package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.OracleRound

/** Ordered-sequence (behavioral) analytics over the event stream —
  * funnels and transition structure. The category's trap at scale is
  * per-user event lists (collect + sort per user: a power user with 10⁷
  * events breaks the executor); both operators here stay in
  * partial-agg/window land:
  *   - the funnel is a chain of (filter → per-user min → join) steps —
  *     one bounded shuffle per funnel STEP, never a per-user list;
  *   - transitions use one per-user ordered window (`lead`), which
  *     sorts within the shuffle partition like any windowed agg.
  *
  * No counterpart in the reference (its event handling stops at windowed
  * counts, srapk_structure_streaming.py:150-160).
  */
object Sequence {

  /** Funnel analysis: of the users who did `steps(0)`, how many went on
    * to do `steps(1)` strictly later, then `steps(2)` strictly later
    * still — with per-step user counts, conversion vs the funnel top,
    * and the mean seconds from first step. Semantics: progressive
    * EARLIEST qualifying times (t₁ = min time of step 1; tₖ = min time
    * of step k after tₖ₋₁) — the standard "earliest path" funnel, which
    * is deterministic and engine-replayable.
    *
    * Shape: one filtered per-user min-agg per step, each joined to the
    * previous step's frame (shuffles on user_id, co-located when the
    * event table is bucketed by user). The final assembly cross-joins
    * three SINGLE-ROW aggregates (constant-size — the documented-bounded
    * BNLJ family) and explodes to one row per step. Gaps are integer
    * seconds (exact sums), so the mean is deterministic cross-engine.
    */
  def funnel(
      spark: SparkSession, sfDir: String,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.length == 3, "funnel() is specified for 3 steps")
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = e.where(col("event_type") === steps(0))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.where(col("event_type") === steps(1))
      .join(s1, Seq("user_id"))
      .where(col("ts") > col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("ts")).as("t2"))
    val s3 = e.where(col("event_type") === steps(2))
      .join(s2, Seq("user_id"))
      .where(col("ts") > col("t2"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("ts")).as("t3"))

    def gap(later: String) =
      col(later).cast("long") - col("t1").cast("long")
    // mean gap as exact-integer sum ÷ count (Spark's avg() over longs
    // folds DOUBLES in partition order — not cross-engine-stable)
    val a1 = s1.agg(count(lit(1)).as("n1"))
    val a2 = s2.agg(count(lit(1)).as("n2"), sum(gap("t2")).as("sg2"))
      .withColumn("g2", col("sg2").cast("double") / col("n2"))
    val a3 = s3.agg(count(lit(1)).as("n3"), sum(gap("t3")).as("sg3"))
      .withColumn("g3", col("sg3").cast("double") / col("n3"))
    val one = a1.crossJoin(a2).crossJoin(a3)
    val rows = array(
      struct(lit(1).as("step"), lit(steps(0)).as("event_type"),
        col("n1").as("n_users"),
        lit(1.0).as("conversion"),
        lit(null).cast("double").as("avg_gap_seconds")),
      struct(lit(2).as("step"), lit(steps(1)).as("event_type"),
        col("n2").as("n_users"),
        (col("n2").cast("double") / col("n1")).as("conversion"),
        col("g2").as("avg_gap_seconds")),
      struct(lit(3).as("step"), lit(steps(2)).as("event_type"),
        col("n3").as("n_users"),
        (col("n3").cast("double") / col("n1")).as("conversion"),
        col("g3").as("avg_gap_seconds")))
    one.select(explode(rows).as("r"))
      .select(col("r.step"), col("r.event_type"), col("r.n_users"),
        OracleRound.roundN(col("r.conversion"), 6).as("conversion"),
        OracleRound.roundN(col("r.avg_gap_seconds"), 6).as("avg_gap_seconds"))
      .orderBy("step")
  }

  /** Cohort retention matrix: users are cohorted by FIRST-event day;
    * for each (cohort, week offset), the count of cohort members active
    * that week and the share of the cohort they represent. The classic
    * product-analytics table, in pure partial-agg form:
    *   - cohort assignment is one per-user min-agg (shuffle on user,
    *     co-located when events are bucketed by user);
    *   - activity is a distinct over (cohort, user, offset) — partial
    *     aggregation collapses each user's events per week BEFORE the
    *     exchange;
    *   - the normalizing join runs on the (cohorts × offsets) matrix,
    *     not the stream, and offset-0 counts ARE the cohort sizes
    *     (every user is active in their own first week by definition).
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val active = e.join(cohorts, Seq("user_id"))
      .select(col("cohort_day"),
        floor(datediff(col("day"), col("cohort_day")) / 7).cast("int")
          .as("week_offset"),
        col("user_id"))
      .distinct()
    val counts = active.groupBy(col("cohort_day"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = counts.where(col("week_offset") === 0)
      .select(col("cohort_day"), col("n_active").as("cohort_size"))
    counts.join(sizes, Seq("cohort_day"))
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        OracleRound.roundN(
          col("n_active").cast("double") / col("cohort_size"), 6)
          .as("retention"))
      .orderBy("cohort_day", "week_offset")
  }

  /** Kaplan–Meier survival curve for signup → first purchase: each
    * signed-up user contributes either an EVENT at their conversion lag
    * (days from signup to first strictly-later purchase) or a CENSORING
    * at their last observed activity — the standard right-censored
    * time-to-event estimator, S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ).
    *
    * Everything per-user is distributed partial-agg work (three min/max
    * aggs + two joins on user). The KM life table itself is bounded by
    * the CALENDAR (≤ one row per distinct lag day), so it is pulled to
    * the driver — the same bounded-pull contract as the centroid/merge
    * tables — where the survival product folds in ascending-day order;
    * the DuckDB oracle folds the identical factor sequence with
    * `list_reduce` (first-element init), so values match bit-for-bit
    * before the 6 dp output rounding. No unpartitioned window anywhere.
    */
  def survivalCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val t0 = e.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
    val conv = e.where(col("event_type") === "purchase")
      .join(t0, Seq("user_id"))
      .where(col("ts") > col("t0"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
    val lastDay = e.groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"))
    val base = t0.join(lastDay, Seq("user_id"))
      .join(conv, Seq("user_id"), "left")
      .select(
        when(col("tp").isNotNull,
          datediff(to_date(col("tp")), to_date(col("t0"))))
          .otherwise(datediff(col("last_day"), to_date(col("t0"))))
          .as("duration"),
        when(col("tp").isNotNull, lit(1)).otherwise(lit(0)).as("event"))
    val km = base.groupBy(col("duration"))
      .agg(sum(col("event")).as("d"),
        sum(lit(1) - col("event")).as("c"))
      .orderBy(col("duration"))
      .collect() // bounded: ≤ one row per distinct lag day (calendar span)
    var atRisk = km.map(r => r.getLong(1) + r.getLong(2)).sum
    var s = 1.0
    val rows = km.map { r =>
      val (t, d, c) = (r.getInt(0), r.getLong(1), r.getLong(2))
      val n = atRisk
      s = s * (1.0 - d.toDouble / n.toDouble)
      atRisk -= (d + c)
      (t, n, d, c, math.floor(s * 1e6 + 0.5) / 1e6)
    }
    import spark.implicits._
    rows.toSeq
      .toDF("duration_days", "at_risk", "events", "censored", "survival")
  }

  /** First-order transition matrix of the event stream: for every
    * consecutive (by time, event_id tie-break) pair of one user's
    * events, count (from_type → to_type) and the row-conditional
    * probability P(next | current). One per-user ordered window + one
    * partial-agg shuffle; the normalizing window runs over the
    * TYPE×TYPE matrix (25 rows), not the stream.
    */
  def transitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wRow = Window.partitionBy(col("from_type"))
    counts.select(col("from_type"), col("to_type"), col("n"),
      OracleRound.roundN(
        col("n").cast("double") / sum(col("n")).over(wRow), 6).as("p"))
      .orderBy("from_type", "to_type")
  }

  /** Stationary distribution of the session transition matrix — the
    * long-run state occupancy implied by [[transitions]]' MLE Markov
    * chain (where does navigation settle?), via `iters` power-iteration
    * rounds from the uniform start. Everything runs on the EVENT-TYPE
    * GRID (≤ |event types| rows): the matrix row-normalizes with exact
    * integer window sums (the division is the only float op, bit-exact
    * cross-engine), each mat-vec entry is a FROM-ORDERED sequential fold
    * rounded 9 dp per round (the adamicAdar fold discipline), output pi
    * at 6 dp. A state with no inbound mass gets 0. The corpus is scanned
    * once for the pair counts; the iteration itself runs driver-side on
    * the collected ≤ |states|² grid (the epochPlan fill class — a
    * documented bounded pull, never a corpus collect).
    */
  def markovStationary(
      spark: SparkSession, sfDir: String, iters: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // each user's LAST event keeps a NULL to_type instead of being
    // filtered: every event then appears exactly once as from_type, so
    // the collected grid carries the full state set (singleton types
    // included) and the corpus really is scanned ONCE — states
    // previously came from a second distinct-event_type scan while the
    // scaladoc claimed one pass (round-13 advice)
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
    // the grid is ≤ |event types|·(|event types|+1) rows — a documented
    // bounded pull (the epochPlan fill class); the power iteration runs
    // driver-side on that grid with the same from-ordered folds the
    // oracle unrolls (the first cut iterated as 5 materialized grid
    // frames, paying ~5 job rounds of scheduling for a handful of rows)
    val grid = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2)))
    val outTotals = grid.collect { case (f, Some(_), n) => (f, n) }
      .groupBy(_._1).map { case (f, xs) => f -> xs.map(_._2).sum }
    val pm = grid.collect { case (f, Some(t), n) =>
      ((f, t), n.toDouble / outTotals(f).toDouble)
    }.toMap
    val states = grid.map(_._1).distinct.sorted
    def r9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    var pi = states.map(_ -> 1.0 / states.length).toMap
    (1 to iters).foreach { _ =>
      pi = states.map { j =>
        val terms = states.flatMap(i => pm.get((i, j)).map(pij => pi(i) * pij))
        j -> (if (terms.isEmpty) 0.0 else r9(terms.foldLeft(0.0)(_ + _)))
      }.toMap
    }
    spark.createDataFrame(states.map(s => (s, r6(pi(s)))).toSeq)
      .toDF("event_type", "pi")
  }

  /** Per-user path negative log-likelihood under the corpus's own
    * first-order Markov model — the behavioral analog of
    * [[graft.operators.TextAnalysis]]'s bigram NLL: score each user's
    * event sequence against the MLE transition matrix (every scored
    * transition is observed, so no smoothing mass is needed) and
    * surface the per-user average −ln P(next | current). Low NLL =
    * stereotypical navigation (bots, loops); high NLL = surprising
    * paths — the session-quality signal a behavioral-data curation
    * pass filters on, exactly as perplexity filters text.
    *
    * Determinism at scale: transitions are ordered (ts, event_id)
    * (tie-free); each user's term list is CUT to the first `maxTrans`
    * transitions by a user-partitioned `row_number()` BEFORE
    * `collect_list` (the [[topPaths]] buffer-bound discipline — ≤
    * `maxTrans` structs per user under any bot-stream skew), sorted by
    * the same order, and summed with a SEQUENTIAL `aggregate` fold, so
    * the IEEE sum is bit-identical on any engine. The model side is
    * two partial-agg shuffles over the TYPE×TYPE matrix; the scoring
    * join broadcasts that matrix (|event_type|² rows).
    */
  def pathNll(
      spark: SparkSession, sfDir: String, maxTrans: Int = 256): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .withColumn("idx", row_number().over(w))
      .where(col("to_type").isNotNull && col("idx") <= maxTrans)
    // n_f via a window over the TYPE×TYPE matrix (≤ |types|² rows) —
    // a counts⋈fromTotals self-join would re-derive the events window
    // a third time; this keeps the corpus at exactly two passes (model
    // aggregation + scoring), with no materialization
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_ft"))
    val model = counts
      .withColumn("n_f",
        sum(col("n_ft")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"),
        log(col("n_ft").cast("double") / col("n_f")).as("term"))
    pairs.join(broadcast(model), Seq("from_type", "to_type"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_trans"),
        sort_array(collect_list(struct(col("idx"), col("term"))))
          .as("terms"))
      .select(col("user_id"), col("n_trans"),
        OracleRound.roundN(
          -aggregate(col("terms"), lit(0.0),
            (acc, t) => acc + t.getField("term")) / col("n_trans"),
          6).as("nll"))
      .orderBy("user_id")
  }

  /** Batch sessionization — the oracle-checked batch truth for
    * [[graft.streaming.StreamOps.sessionize]]'s gap rule: per user,
    * events ordered by (ts, event_id) split into sessions wherever the
    * gap to the previous event EXCEEDS `gapMinutes` (the classic
    * gaps-and-islands: a lag flag + running sum numbers the islands,
    * then one partial-agg per session). All time math is exact integer
    * MICROSECONDS (`unix_micros` ≡ DuckDB `epoch_us`) — second-truncated
    * casts would flip boundaries on sub-second timestamps — and money is
    * integer cents, so every output column hash-matches with no
    * tolerance.
    *
    * Scale shape: one user-partitioned ordered window (fine-grained
    * partitions — no global sort) + one (user, session) partial-agg;
    * co-located end-to-end when events are bucketed by user.
    */
  /** Shared gaps-and-islands prefix of [[sessions]] and [[topPaths]]:
    * per-event session index from the user-partitioned ordered lag flag
    * + running island sum, in EXACT integer microseconds.
    */
  private def sessionIndexed(
      spark: SparkSession, sfDir: String, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        (col("prev_us").isNull || col("us") - col("prev_us") > gapUs)
          .cast("int"))
      .withColumn("session_idx", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessions(
      spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30): DataFrame = {
    sessionIndexed(spark, sfDir, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("value_cents"))
      .select(col("user_id"), col("session_idx"),
        col("start_us"), col("end_us"),
        ((col("end_us") - col("start_us")) / lit(1000000L)).cast("long")
          .as("duration_seconds"),
        col("n_events"), col("value_cents"))
      .orderBy("user_id", "session_idx")
  }

  /** Top behavioral paths: the most common event-type sequences per
    * session ("view→click→purchase beats view→view→exit") — the path
    * mining that turns the [[sessions]] islands into product-analytics
    * navigation patterns. Each session contributes its first `maxLen`
    * events (ordered (ts, event_id) — exact, tie-free), rendered as one
    * `a>b>c` path string; the result is the top `k` paths by
    * (sessions desc, path asc), a deterministic cut.
    *
    * Scale shape: the islands window is user-partitioned (never
    * global); the per-session head is cut BEFORE any aggregation by a
    * (user_id, session_idx)-partitioned `row_number()` over
    * (us, event_id) — so the `collect_list` buffer holds at most
    * `maxLen` structs per session by construction, bot sessions
    * included (a post-agg `slice` would bound only the output, not the
    * TypedImperativeAggregate's state). The window order equals the
    * `sort_array` order (us, event_id, event_type — event_id unique),
    * so the pre-cut keeps the exact same rows the old slice kept. The
    * path rollup is one partial-agg over ≤ |event_type|^maxLen keys
    * and the cut is TakeOrderedAndProject.
    */
  def topPaths(
      spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30, maxLen: Int = 8, k: Int = 20): DataFrame = {
    val headW = Window
      .partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("us"), col("event_id"))
    sessionIndexed(spark, sfDir, gapMinutes)
      .withColumn("rn", row_number().over(headW))
      .where(col("rn") <= maxLen)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(sort_array(collect_list(struct(
        col("us"), col("event_id"), col("event_type")))).as("head"))
      .select(concat_ws(">",
        transform(col("head"), e => e.getField("event_type"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Multi-touch revenue attribution: every purchase's value is credited
    * to the user's preceding view/click touches inside a lookback
    * window, under the three standard models at once — first-touch (all
    * credit to the earliest touch), last-touch (the latest), and linear
    * (an equal split across the path) — plus a `none` channel carrying
    * purchases with no touch in window, so each model's credit ledger is
    * complete. The marketing-analytics sibling of [[funnel]]: funnel asks
    * "who converts", attribution asks "which touchpoint earns the
    * revenue".
    *
    * Scale shape: ONE purchases⋈touches equi-join on `user_id`
    * (co-located when events are bucketed by user) with the lookback as
    * a residual range predicate — never a time-only banded join; windows
    * partition by PURCHASE id (millions of tiny partitions, no skewable
    * global window); the anti-join for unattributed purchases rides the
    * same user-partitioned shape.
    *
    * Determinism: credit is integer MICRO-CENTS — full credit is
    * cents·10⁶ exactly; a linear share is floor(cents·10⁶ / n), one
    * IEEE division of exactly-representable integers floored identically
    * on both engines — so sums are long-exact in any order, and the
    * display dollars derive from the exact long by one final division.
    * Ties on touch time break by event_id (unique), so first/last are
    * total orders.
    */
  def attribution(
      spark: SparkSession, sfDir: String,
      lookbackDays: Int = 7): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ts").as("pts"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
    val touches = e.where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts").as("tts"),
        col("event_id").as("tid"), col("event_type").as("channel"))
    val joined = purchases.join(touches, Seq("user_id"))
      .where(col("tts") < col("pts") &&
        col("tts") >= col("pts") - expr(s"INTERVAL $lookbackDays DAYS"))
    val byPurchase = Window.partitionBy(col("pid"))
    val touched = joined
      .withColumn("n", count(lit(1)).over(byPurchase))
      .withColumn("rn_asc", row_number().over(
        byPurchase.orderBy(col("tts"), col("tid"))))
      .withColumn("rn_desc", row_number().over(
        byPurchase.orderBy(col("tts").desc, col("tid").desc)))
    val untouched = purchases
      .join(joined.select(col("pid")).distinct(), Seq("pid"), "left_anti")
    val micro = col("cents") * lit(1000000L)
    val credits = touched.where(col("rn_asc") === 1)
      .select(lit("first_touch").as("model"), col("channel"), micro.as("micro"))
      .unionByName(touched.where(col("rn_desc") === 1)
        .select(lit("last_touch").as("model"), col("channel"), micro.as("micro")))
      .unionByName(touched
        .select(lit("linear").as("model"), col("channel"),
          floor(micro.cast("double") / col("n")).cast("long").as("micro")))
      .unionByName(Seq("first_touch", "last_touch", "linear")
        .map(m => untouched.select(
          lit(m).as("model"), lit("none").as("channel"), micro.as("micro")))
        .reduce(_ unionByName _))
    credits.groupBy(col("model"), col("channel"))
      .agg(count(lit(1)).as("n_credits"), sum(col("micro")).as("attributed_micro"))
      .select(col("model"), col("channel"), col("n_credits"),
        col("attributed_micro"),
        OracleRound.roundN(
          col("attributed_micro").cast("double") / 1e8, 4).as("attributed_revenue"))
      .orderBy("model", "channel")
  }

  /** RFM segmentation of the customer base: per-customer recency (last
    * order day) / frequency (order count) / monetary (exact integer
    * cents) scored into quintiles — quintile 5 = most recent / most
    * frequent / highest spend — and rolled up to the ≤125 (r, f, m)
    * segments with their customer counts and revenue mass. The classic
    * lifecycle segmentation ("5-5-5 champions", "1-x-x churned") on the
    * orders table.
    *
    * Exactness and scale: money snaps to cents per order BEFORE the
    * customer sum (long math, order-independent); each quintile is the
    * exact distributed ntile ([[graft.engine.GlobalOrder.withNtile]] —
    * the range-exchange prefix-sum topology, never a single-reducer
    * window) with the custkey tie-break making every boundary
    * deterministic; the rollup is one ≤125-group partial-agg.
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val per = orders.groupBy(col("o_custkey").as("custkey"))
      .agg(
        max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
    val r = graft.engine.GlobalOrder.withNtile(
      per, Seq(col("last_day"), col("custkey")), 5, "r_q")
    val f = graft.engine.GlobalOrder.withNtile(
      r, Seq(col("frequency"), col("custkey")), 5, "f_q")
    val m = graft.engine.GlobalOrder.withNtile(
      f, Seq(col("cents"), col("custkey")), 5, "m_q")
    m.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("total_cents"))
      .orderBy("r_q", "f_q", "m_q")
  }
}

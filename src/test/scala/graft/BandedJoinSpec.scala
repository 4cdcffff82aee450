package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BandedRangeJoinRule

/** BandedRangeJoinRule: a bare range-band join (no equi key — Spark plans
  * BroadcastNestedLoopJoin) is rewritten to a banded equi-join with the
  * original predicate as residual. The spec pins the two contracts:
  * result identity with the naive plan, and the plan-shape upgrade.
  */
class BandedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(BandedRangeJoinRule)
    try body
    finally spark.experimental.extraOptimizations = Nil
  }

  // deterministic pseudo-random longs, including negatives and values
  // straddling bucket boundaries
  private def mkSides() = {
    import spark.implicits._
    val l = (0 until 500).map(i => (i.toLong, (i * 7919L % 1000L) - 300L))
      .toDF("lid", "lv")
    val r = (0 until 300).map(i => (i.toLong, (i * 104729L % 1000L) - 300L))
      .toDF("rid", "rv")
    (l, r)
  }

  test("range-band join rewrites to an equi plan with identical results") {
    val (l, r) = mkSides()
    val cond = col("lv") >= col("rv") - 100L && col("lv") <= col("rv")
    val naive = l.join(r, cond)
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"precondition: the naive range join should nested-loop:\n$naivePlan")
    val expected = naive.collect()
      .map(x => (x.getLong(0), x.getLong(2))).sorted.toSeq

    withRule {
      val banded = l.join(r, cond)
      val plan = banded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not upgrade the plan:\n$plan")
      assert(plan.contains("__graft_band"), s"band keys missing:\n$plan")
      val got = banded.collect()
        .map(x => (x.getLong(0), x.getLong(2))).sorted.toSeq
      assert(got == expected, "banded join changed the join result")
      assert(got.nonEmpty, "degenerate fixture: no matching pairs")
    }
  }

  test("orientation and Add/Subtract spellings all rewrite") {
    val (l, r) = mkSides()
    val spellings = Seq(
      // r - 100 <= l <= r, bounds written flipped
      col("rv") - 100L <= col("lv") && col("rv") >= col("lv"),
      // symmetric band via Add on both bounds
      col("lv") >= col("rv") + lit(-50L) && col("lv") <= col("rv") + lit(50L),
      // strict bounds
      col("lv") > col("rv") - 100L && col("lv") < col("rv"))
    spellings.zipWithIndex.foreach { case (cond, i) =>
      val expected = l.join(r, cond).collect()
        .map(x => (x.getLong(0), x.getLong(2))).sorted.toSeq
      withRule {
        val banded = l.join(r, cond)
        val plan = banded.queryExecution.executedPlan.toString
        assert(plan.contains("__graft_band"), s"spelling $i not rewritten:\n$plan")
        val got = banded.collect()
          .map(x => (x.getLong(0), x.getLong(2))).sorted.toSeq
        assert(got == expected, s"spelling $i changed the join result")
      }
    }
  }

  test("int-typed band columns rewrite too (event-time seconds shape)") {
    import spark.implicits._
    val l = (0 until 400).map(i => (i, (i * 37) % 500 - 100)).toDF("lid", "lv")
    val r = (0 until 250).map(i => (i, (i * 91) % 500 - 100)).toDF("rid", "rv")
    val cond = col("lv") >= col("rv") - 60 && col("lv") <= col("rv")
    val expected = l.join(r, cond).select("lid", "rid").collect()
      .map(x => (x.getInt(0), x.getInt(1))).sorted.toSeq
    withRule {
      val banded = l.join(r, cond)
      val plan = banded.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_band"), s"int band not rewritten:\n$plan")
      val got = banded.select("lid", "rid").collect()
        .map(x => (x.getInt(0), x.getInt(1))).sorted.toSeq
      assert(got == expected, "int banded join changed the result")
      assert(got.nonEmpty, "degenerate fixture: no matching pairs")
    }
  }

  test("timestamp band columns rewrite (ts BETWEEN t - INTERVAL x AND t)") {
    import spark.implicits._
    // sub-second spacing so a seconds-truncating cast would misbucket:
    // events every 7.3 s + i*137 ms, probes every 11.9 s + i*911 ms
    val l = (0 until 400)
      .map(i => (i.toLong, 1609459200000000L + i * 7300000L + i * 137000L))
      .toDF("lid", "lus").select(col("lid"), timestamp_micros(col("lus")).as("lts"))
    val r = (0 until 250)
      .map(i => (i.toLong, 1609459200000000L + i * 11900000L + i * 911000L))
      .toDF("rid", "rus").select(col("rid"), timestamp_micros(col("rus")).as("rts"))
    val cond = expr("lts BETWEEN rts - INTERVAL '30' MINUTE AND rts")
    val naive = l.join(r, cond)
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "precondition: the naive timestamp range join should nested-loop")
    val expected = naive.select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    withRule {
      val banded = l.join(r, cond)
      val plan = banded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not upgrade the timestamp range join:\n$plan")
      assert(plan.contains("__graft_band"), s"band keys missing:\n$plan")
      val got = banded.select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got == expected, "timestamp banded join changed the join result")
      assert(got.nonEmpty && got.size < 400L * 250L,
        "degenerate fixture: band neither selective nor populated")
    }
  }

  test("timestamp band via the Column API with interval subtraction") {
    import spark.implicits._
    val l = (0 until 300)
      .map(i => (i.toLong, 1609459200000000L + i * 9700000L))
      .toDF("lid", "lus").select(col("lid"), timestamp_micros(col("lus")).as("lts"))
    val r = (0 until 200)
      .map(i => (i.toLong, 1609459200000000L + i * 14300000L))
      .toDF("rid", "rus").select(col("rid"), timestamp_micros(col("rus")).as("rts"))
    // asymmetric band: t - 10 min ≤ ts ≤ t + 90 s
    val cond = col("lts") >= col("rts") - expr("INTERVAL '10' MINUTE") &&
      col("lts") <= col("rts") + expr("INTERVAL '90' SECOND")
    val expected = l.join(r, cond).select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    withRule {
      val banded = l.join(r, cond)
      val plan = banded.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_band"),
        s"asymmetric timestamp band not rewritten:\n$plan")
      val got = banded.select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got == expected, "asymmetric timestamp band changed the result")
      assert(got.nonEmpty, "degenerate fixture: no matching pairs")
    }
  }

  test("date band columns rewrite (order_date BETWEEN d - 30 AND d)") {
    import spark.implicits._
    // dates spread over ~2 years so a 30-day band is selective; both the
    // bare `- 30` spelling (resolver maps date - int to DateSub) and the
    // explicit date_sub/date_add functions must rewrite in the DAYS domain
    val l = (0 until 400).map(i => (i.toLong, (i * 37) % 700))
      .toDF("lid", "ldays")
      .select(col("lid"),
        expr("date_add(date '2020-01-01', ldays)").as("ldate"))
    val r = (0 until 250).map(i => (i.toLong, (i * 91) % 700))
      .toDF("rid", "rdays")
      .select(col("rid"),
        expr("date_add(date '2020-01-01', rdays)").as("rdate"))
    val spellings = Seq(
      expr("ldate BETWEEN rdate - 30 AND rdate"),
      expr("ldate BETWEEN date_sub(rdate, 30) AND date_add(rdate, 0)"))
    spellings.zipWithIndex.foreach { case (cond, i) =>
      val naive = l.join(r, cond)
      assert(naive.queryExecution.executedPlan.toString
          .contains("BroadcastNestedLoopJoin"),
        s"precondition: naive date range join $i should nested-loop")
      val expected = naive.select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      withRule {
        val banded = l.join(r, cond)
        val plan = banded.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
          s"rule did not upgrade date spelling $i:\n$plan")
        assert(plan.contains("__graft_band"), s"band keys missing:\n$plan")
        val got = banded.select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
        assert(got == expected, s"date spelling $i changed the join result")
        assert(got.nonEmpty && got.size < 400L * 250L,
          "degenerate fixture: band neither selective nor populated")
      }
    }
  }

  test("rule stands down when ANSI mode is off (overflow contract)") {
    val (l, r) = mkSides()
    val cond = col("lv") >= col("rv") - 100L && col("lv") <= col("rv")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try withRule {
      val plan = l.join(r, cond).queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_band"),
        s"non-ANSI session must keep the naive plan (silent-wrap hazard):\n$plan")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("joins with an equi key or width-0 bands are left alone") {
    val (l, r) = mkSides()
    withRule {
      // equi + range: hash/merge join already works — must not rewrite
      val equi = l.join(r, col("lid") === col("rid") &&
        col("lv") >= col("rv") - 100L && col("lv") <= col("rv"))
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft_band"),
        "equi join must not be rewritten")
      // width 0 (l between r and r) is an equality in disguise — skip
      val zero = l.join(r, col("lv") >= col("rv") && col("lv") <= col("rv"))
      assert(!zero.queryExecution.executedPlan.toString.contains("__graft_band"),
        "width-0 band must not be rewritten")
    }
  }

  test("GraftExtensions injects the rule: a SQL range join plans banded") {
    spark.sparkContext // ensure the shared context exists first
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      // same programmatic hook as the spark.sql.extensions static conf
      // (VectorOpsSpec documents why the shared test context can't
      // exercise the conf path directly)
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.engine.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      (0L until 200L).map(i => (i, (i * 7919L) % 400L)).toDF("lid", "lv")
        .createOrReplaceTempView("gl")
      (0L until 100L).map(i => (i, (i * 104729L) % 400L)).toDF("rid", "rv")
        .createOrReplaceTempView("gr")
      val q = s2.sql(
        "SELECT lid, rid FROM gl JOIN gr ON lv BETWEEN rv - 50 AND rv")
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_band"),
        "the conf-deployed rule must rewrite a plain SQL range join")
      val viaRule = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // expected result from the shared session, which has NO rule
      val expected = {
        import spark.implicits._
        val l = (0L until 200L).map(i => (i, (i * 7919L) % 400L)).toDF("lid", "lv")
        val r = (0L until 100L).map(i => (i, (i * 104729L) % 400L)).toDF("rid", "rv")
        l.join(r, col("lv") >= col("rv") - 50L && col("lv") <= col("rv"))
          .collect().map(x => (x.getLong(0), x.getLong(2))).sorted.toSeq
      }
      assert(viaRule == expected && viaRule.nonEmpty,
        "rule-session results must equal the naive join")
    } finally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

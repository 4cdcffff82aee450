package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.IntervalOverlapJoinRule

/** IntervalOverlapJoinRule: the naive SQL spelling of a variable-width
  * interval containment join (`pt BETWEEN iv.lo AND iv.hi`, lo/hi
  * different columns — Spark plans BroadcastNestedLoopJoin) is rewritten
  * to the bucket-explode equi-join of `Relational.intervalJoin`, with
  * the bucket width lifted from a max-width scalar subquery. Contracts
  * pinned here: result identity with the naive plan, the plan-shape
  * upgrade, and narrow eligibility (equi-keyed joins and non-ANSI
  * sessions are left alone).
  */
class IntervalRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(IntervalOverlapJoinRule)
    try body
    finally spark.experimental.extraOptimizations = Nil
  }

  // points include negatives; intervals have varying widths (1..120),
  // some inverted (lo > hi — must match nothing), straddling boundaries
  private def mkFrames() = {
    import spark.implicits._
    val p = (0 until 600).map(i => (i.toLong, (i * 7919L % 2000L) - 500L))
      .toDF("pid", "pt")
    val iv = (0 until 150).map { i =>
      val lo = (i * 104729L % 2000L) - 500L
      val w = i * 37L % 140L - 20L // negative w → inverted interval
      (i.toLong, lo, lo + w)
    }.toDF("ivid", "lo", "hi")
    (p, iv)
  }

  test("naive BETWEEN lo AND hi spelling upgrades with identical results") {
    val (p, iv) = mkFrames()
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val naive = p.join(iv, cond)
    assert(naive.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
      "precondition: the naive interval join should nested-loop")
    val expected = naive.select("pid", "ivid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    withRule {
      val upgraded = p.join(iv, cond)
      val plan = upgraded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not upgrade the interval join:\n$plan")
      assert(plan.contains("__graft_iv"), s"bucket keys missing:\n$plan")
      val got = upgraded.select("pid", "ivid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got == expected, "interval rewrite changed the join result")
      assert(got.nonEmpty && got.size < 600L * 150L,
        "degenerate fixture: join neither selective nor populated")
    }
  }

  test("orientation, strict bounds, and swapped join sides rewrite") {
    val (p, iv) = mkFrames()
    val spellings = Seq(
      // bounds written flipped
      col("lo") <= col("pt") && col("hi") >= col("pt"),
      // strict containment
      col("pt") > col("lo") && col("pt") < col("hi"))
    spellings.zipWithIndex.foreach { case (cond, i) =>
      val expected = p.join(iv, cond).select("pid", "ivid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      withRule {
        val upgraded = p.join(iv, cond)
        assert(upgraded.queryExecution.executedPlan.toString.contains("__graft_iv"),
          s"spelling $i not rewritten")
        val got = upgraded.select("pid", "ivid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
        assert(got == expected, s"spelling $i changed the join result")
      }
    }
    // intervals ⋈ points (interval side on the left)
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val expected = iv.join(p, cond).select("pid", "ivid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    withRule {
      val upgraded = iv.join(p, cond)
      assert(upgraded.queryExecution.executedPlan.toString.contains("__graft_iv"),
        "swapped-side join not rewritten")
      val got = upgraded.select("pid", "ivid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got == expected, "swapped-side rewrite changed the result")
    }
  }

  test("timestamp-typed containment rewrites via exact micros") {
    import spark.implicits._
    // sub-second offsets so a seconds-truncating cast would misbucket
    val p = (0 until 400)
      .map(i => (i.toLong, 1609459200000000L + i * 3100000L + i * 331000L))
      .toDF("pid", "pus").select(col("pid"), timestamp_micros(col("pus")).as("pt"))
    val iv = (0 until 120).map { i =>
      val lo = 1609459200000000L + i * 9700000L
      (i.toLong, lo, lo + (i % 40) * 700000L)
    }.toDF("ivid", "lous", "hius")
      .select(col("ivid"), timestamp_micros(col("lous")).as("lo"),
        timestamp_micros(col("hius")).as("hi"))
    val cond = expr("pt BETWEEN lo AND hi")
    val expected = p.join(iv, cond).select("pid", "ivid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    withRule {
      val upgraded = p.join(iv, cond)
      assert(upgraded.queryExecution.executedPlan.toString.contains("__graft_iv"),
        "timestamp containment not rewritten")
      val got = upgraded.select("pid", "ivid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got == expected, "timestamp rewrite changed the result")
      assert(got.nonEmpty, "degenerate fixture: no contained points")
    }
  }

  test("date-typed containment rewrites in the epoch-days domain") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val p = (0 until 500).map(i => (i.toLong, (i * 37) % 900))
      .toDF("pid", "pd")
      .select(col("pid"), expr("date_add(date '2020-01-01', pd)").as("pt"))
    val iv = (0 until 120).map { i =>
      val lo = (i * 104729L % 900L).toInt
      (i.toLong, lo, lo + (i * 13) % 45) // widths 0..44 days
    }.toDF("ivid", "lod", "hid")
      .select(col("ivid"),
        expr("date_add(date '2020-01-01', lod)").as("lo"),
        expr("date_add(date '2020-01-01', hid)").as("hi"))
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val naive = p.join(iv, cond)
    assert(naive.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
      "precondition: the naive date interval join should nested-loop")
    val expected = naive.select("pid", "ivid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    withRule {
      val upgraded = p.join(iv, cond)
      val plan = upgraded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule did not upgrade the date interval join:\n$plan")
      assert(plan.contains("__graft_iv"), s"bucket keys missing:\n$plan")
      val got = upgraded.select("pid", "ivid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(got == expected, "date interval rewrite changed the join result")
      assert(got.nonEmpty && got.size < 500L * 120L,
        "degenerate fixture: join neither selective nor populated")
    }
  }

  test("empty and all-inverted interval sides yield the naive empty result") {
    import spark.implicits._
    val (p, _) = mkFrames()
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val empty = Seq.empty[(Long, Long, Long)].toDF("ivid", "lo", "hi")
    val inverted = (0 until 50)
      .map(i => (i.toLong, i * 13L, i * 13L - 5L)).toDF("ivid", "lo", "hi")
    withRule {
      // statically-empty side: PropagateEmptyRelation folds the whole
      // join away (with or without this rule) — only the result matters
      assert(p.join(empty, cond).count() == 0L)
      // all-inverted side: rows exist, so the rule fires and the runtime
      // NULL width must yield the naive plan's empty result
      val upgraded = p.join(inverted, cond)
      assert(upgraded.queryExecution.optimizedPlan.toString.contains("__graft_iv"),
        "rule should still fire; the NULL width makes the result empty")
      assert(upgraded.count() == 0L, "no valid interval can match any point")
    }
  }

  test("equi-keyed joins and non-ANSI sessions are left alone") {
    val (p, iv) = mkFrames()
    val keyed = col("pid") === col("ivid") &&
      col("pt") >= col("lo") && col("pt") <= col("hi")
    withRule {
      assert(!p.join(iv, keyed).queryExecution.optimizedPlan.toString
          .contains("__graft_iv"),
        "an equi-keyed join already shuffles correctly — no rewrite")
    }
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try withRule {
      assert(!p.join(iv, cond).queryExecution.optimizedPlan.toString
          .contains("__graft_iv"),
        "non-ANSI session must keep the naive plan (silent-wrap hazard)")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("GraftExtensions injects the rule: naive SQL plans without BNLJ") {
    spark.sparkContext
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.engine.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      (0L until 300L).map(i => (i, (i * 7919L) % 900L)).toDF("pid", "pt")
        .createOrReplaceTempView("ip")
      (0L until 80L).map { i =>
        val lo = (i * 104729L) % 900L
        (i, lo, lo + i % 60L)
      }.toDF("ivid", "lo", "hi").createOrReplaceTempView("iiv")
      val q = s2.sql(
        "SELECT pid, ivid FROM ip JOIN iiv ON pt BETWEEN lo AND hi")
      val plan = q.queryExecution.executedPlan.toString
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_iv") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"the deployed rule must rewrite the naive SQL spelling:\n$plan")
      val viaRule = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val expected = {
        import spark.implicits._
        val p = (0L until 300L).map(i => (i, (i * 7919L) % 900L)).toDF("pid", "pt")
        val iv = (0L until 80L).map { i =>
          val lo = (i * 104729L) % 900L
          (i, lo, lo + i % 60L)
        }.toDF("ivid", "lo", "hi")
        p.join(iv, col("pt") >= col("lo") && col("pt") <= col("hi"))
          .select("pid", "ivid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
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

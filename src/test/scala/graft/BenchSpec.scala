package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Bench harness honesty: a throwing query must surface under "errors" and
  * contribute NOTHING to the timing stats or the total — a regression that
  * breaks a query must never read as a speedup (round-3 verdict).
  */
class BenchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ok_range" -> ((s, _) => s.range(100).toDF("n")),
    // fails at analysis: the column does not exist
    "bad_analysis" -> ((s, _) => s.range(1).toDF("n").select("no_such_column")),
    // fails at runtime inside the action
    "bad_runtime" -> ((s, _) => {
      import org.apache.spark.sql.functions._
      s.range(1).toDF("n").select((lit(1) / lit(0)).cast("int").as("x"),
        assert_true(lit(false)).as("boom"))
    })
  )

  test("failing queries land in errors, not in stats or the total") {
    val (stats, errors) = Bench.measure(spark, "/unused", queries, runs = 2)
    assert(stats.map(_.name) == Seq("ok_range"))
    assert(stats.head.runs == 2)
    assert(errors.keySet == Set("bad_analysis", "bad_runtime"))
    val json = Bench.render(stats, errors, "sfX")
    assert(json.contains(""""errors":{"""))
    assert(json.contains(""""bad_analysis":"""))
    // the total is the ok query's median only — parse it back out
    val total = """"value":([0-9.E-]+)""".r.findFirstMatchIn(json).get.group(1).toDouble
    assert(total == stats.head.median)
    assert(!json.contains(""""bad_analysis":{"min""""))
  }

  test("render escapes quotes and backslashes in error messages") {
    val json = Bench.render(Nil, Map("q" -> """boom "quoted" \ slash"""), "sf")
    assert(json.contains("""\"quoted\""""))
    assert(json.contains("""\\ slash"""))
  }

  test("the probe's sort actually executes (EliminateSorts must not strip it)") {
    // probe v1 plugged the sorted frame straight into bit_xor and Catalyst's
    // EliminateSorts removed the sort (bit_xor is whitelisted as
    // order-irrelevant), silently turning the box probe into a CPU-only
    // measurement. Guard the v2 barrier: the plan the probe times must
    // contain a live Sort + range Exchange BEFORE the aggregate consumes it.
    val sorted = spark.range(0L, 1000L, 1L, 4)
      .selectExpr("xxhash64(id) AS h")
      .orderBy("h")
    val (cp, free) = graft.engine.OpCache.checkpointWithHandle(sorted)
    try {
      // the checkpointed frame's lineage was executed through the sort; its
      // own plan is a leaf, so assert on the PRE-barrier plan the probe runs
      val plan = sorted.queryExecution.executedPlan.toString
      assert(plan.contains("Sort"), s"probe plan lost its sort:\n$plan")
      assert(plan.contains("rangepartitioning") || plan.contains("Exchange"),
        s"probe plan lost its range exchange:\n$plan")
      // and the aggregate over the barrier must NOT see a sort to eliminate
      val rows = cp.selectExpr("bit_xor(h)").collect()
      assert(rows.length == 1)
    } finally free()
  }
}

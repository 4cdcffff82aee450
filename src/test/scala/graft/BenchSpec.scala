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
    // measurement. Assert on Bench.probeFrame ITSELF — the construction
    // probeOnce times — not a structural mirror that could drift from it.
    val sorted = Bench.probeFrame(spark, rows = 1000L)
    val (cp, free) = graft.engine.OpCache.checkpointWithHandle(sorted)
    try {
      val plan = sorted.queryExecution.executedPlan.toString
      assert(plan.contains("Sort"), s"probe plan lost its sort:\n$plan")
      assert(plan.contains("rangepartitioning") || plan.contains("Exchange"),
        s"probe plan lost its range exchange:\n$plan")
      // the barrier must be a true lineage cut: the checkpointed frame
      // analyzes to a bare LogicalRDD leaf, so the aggregate physically
      // CANNOT reach back and give EliminateSorts a sort to strip — this
      // is the v2 property, asserted on the executed object, not mirrored
      val analyzed = cp.queryExecution.analyzed
      assert(analyzed.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
        s"checkpoint is not a lineage-cut leaf:\n$analyzed")
      val aggPlan = cp.selectExpr("bit_xor(h)").queryExecution
        .executedPlan.toString
      assert(!aggPlan.contains("Sort"),
        s"aggregate over the barrier still sees a sort:\n$aggPlan")
      val rows = cp.selectExpr("bit_xor(h)").collect()
      assert(rows.length == 1)
    } finally free()
  }
}

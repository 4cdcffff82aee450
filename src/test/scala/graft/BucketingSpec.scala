package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Bucketing: pre-shuffling fact tables on the join key at write time so
  * repeated joins run exchange-free — the co-located-join strategy for a
  * 100 TB fact⋈fact workload (SURVEY.md §7 scale notes). Asserts the
  * bucketed join plan contains no shuffle Exchange.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    graft.engine.Sessions
      .builder("graft-bucketing-test").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
  }

  /** Drop the table and its physical location: when suites share one
    * session (getOrCreate), this spec's warehouse config may be ignored
    * and a stale location from a previous run fails saveAsTable.
    */
  private def dropHard(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = java.nio.file.Paths.get(wh, table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    // force the SMJ path for THIS test only — getOrCreate shares one
    // session across suites, so a builder-level config would leak the
    // disabled broadcast into every later suite's plans (PlanSpec would
    // see un-hinted theta joins degrade to CartesianProduct)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody(sf)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinBody(sf: String): Unit = {
    dropHard("li_bucketed")
    dropHard("ord_bucketed")
    Tables.lineitem(spark, sf).write
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf).write
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val li = spark.table("li_bucketed")
    val ord = spark.table("ord_bucketed")
    val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // and it still computes the right thing
    val liRaw = Tables.lineitem(spark, sf)
    val ordRaw = Tables.orders(spark, sf)
    val expected = liRaw
      .join(ordRaw, liRaw("l_orderkey") === ordRaw("o_orderkey"))
      .count()
    assert(joined.count() == expected)
  }
}

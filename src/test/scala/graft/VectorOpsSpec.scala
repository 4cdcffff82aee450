package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.functions.VectorOps

/** The codegen DotProductExpr must be bit-identical to the HOF fold it
  * replaced (same left-to-right accumulation) — on the real embeddings.
  */
class VectorOpsSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("codegen dot product is bit-identical to the HOF fold") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") < col("ia") + 10)
    val diff = pairs.select(
      VectorOps.dot(col("va"), col("vb")).as("fast"),
      VectorOps.dotHof(col("va"), col("vb")).as("ref"))
      .where(col("fast") =!= col("ref"))
      .count()
    assert(diff == 0, s"$diff pairs differ between codegen and HOF dot")
  }

  test("spark.sql.extensions config injects graft_dot at session build time") {
    import org.apache.spark.sql.SparkSession
    spark.sparkContext // ensure the shared context exists first
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a STATIC conf read from the SparkContext
      // conf at context creation (the spark-submit --conf path); this JVM's
      // shared context predates it, so exercise the same class through the
      // equivalent programmatic hook
      val s2 = SparkSession.builder().master("local[2]")
        .withExtensions(new graft.engine.GraftExtensions)
        .getOrCreate()
      val d = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect().head.getDouble(0)
      assert(d == 11.0)
    } finally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("norms are positive and cosine is within [-1, 1]") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val norms = e.select(VectorOps.l2Norm(col("v")).as("n"))
    assert(norms.where(col("n") <= 0).count() == 0)
    val a = e.limit(50).select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.limit(50).select(col("vec_id").as("ib"), col("v").as("vb"))
    val bad = a.join(b, col("ia") =!= col("ib"))
      .select(VectorOps.cosine(col("va"), col("vb")).as("c"))
      .where(col("c") > 1.0000000001 || col("c") < -1.0000000001)
      .count()
    assert(bad == 0)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GlobalOrder

/** The distributed prefix-sum/rank/ntile primitives must match their
  * single-reducer window equivalents — bit-exactly for integral values
  * (long addition is associative), and to ULP-level tolerance for
  * FRACTIONAL running sums: the distributed topology adds the partition
  * offset to each local prefix, which associates double additions
  * differently from the window's strict left-to-right fold, so exact
  * Double equality is impossible by construction. (The round-5 review
  * also found a blanket long cast silently truncating doubles — the
  * dtype assertions below pin that fix.)
  */
class GlobalOrderSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-globalorder-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def releaseAfter[T](body: => T): T =
    try body finally graft.engine.OpCache.release(spark)

  test("fractional running sum matches the single-reducer window within ULP tolerance") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, i * 0.25 + 0.99)).toDF("k", "v")
    releaseAfter {
      val dist = GlobalOrder.withPrefixSum(df, Seq(col("k")), col("v"), "cum")
        .select("k", "cum").as[(Long, Double)].collect().toMap
      val single = df.withColumn("cum",
          sum(col("v")).over(Window.orderBy(col("k"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("k", "cum").as[(Long, Double)].collect().toMap
      assert(dist.keySet == single.keySet, "key sets diverged")
      // Exact Double equality is impossible: the offset-table topology
      // re-associates the additions. Bound the drift at a few hundred ULPs
      // of the running magnitude — far below any semantic difference,
      // far above accumulation-order noise.
      dist.foreach { case (k, d) =>
        val s = single(k)
        val tol = math.max(math.ulp(math.max(math.abs(d), math.abs(s))) * 512, 1e-12)
        assert(math.abs(d - s) <= tol,
          s"key $k: distributed $d vs window $s exceeds tolerance $tol")
      }
      // and the dtype is the sum's natural double, not a truncated long
      assert(GlobalOrder.withPrefixSum(df, Seq(col("k")), col("v"), "cum")
        .schema("cum").dataType.typeName == "double")
    }
  }

  test("integral prefix sum keeps the long dtype and exact rank semantics") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 7919) % 500).toLong -> i.toLong)
      .toDF("k", "tie")
    releaseAfter {
      val ranked = GlobalOrder.withGlobalRank(
        df, Seq(col("k"), col("tie")), "rnk")
      assert(ranked.schema("rnk").dataType.typeName == "long")
      val rnks = ranked.select("rnk").as[Long].collect().sorted
      assert(rnks.sameElements(1L to 500L), "rank is not a 1..N permutation")
    }
  }
}

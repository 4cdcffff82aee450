package graft

/** Local analog of the driver's t1 smoke: run SparkEntry.entry on sf0.001
  * and assert rows > 0. Usage: scripts/run_verify.sh graft.Smoke
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.get("graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows = $n")
    assert(n > 0, "entry returned 0 rows")
    spark.stop()
  }
}

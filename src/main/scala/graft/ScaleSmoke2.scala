package graft

/** 10× scale smoke for the second-session dedup joins (edit distance,
  * containment) — the same empirical no-hidden-quadratic check the
  * round-7 top-5 profile got (BASELINE.md sf1 table). Reads the
  * driver's sf0.1 testdata and a [[ScaleUp]]-generated 10× fixture
  * back-to-back, 3 runs each, and prints medians; ratios at 10× data
  * far below ~100× rule out a quadratic candidate volume. Timing-only:
  * correctness stays anchored to the DuckDB oracle at sf0.01.
  */
object ScaleSmoke2 {
  def main(args: Array[String]): Unit = {
    val scaledDir = args.headOption.getOrElse("/tmp/graft_sf1_s2")
    val spark = graft.engine.Sessions.get("graft-scalesmoke2")
    val names = Seq("dedup_edit_distance", "dedup_containment")
    for (dir <- Seq("/root/testdata/sf0.1", scaledDir); n <- names) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        graft.engine.OpCache.release(spark)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[smoke2] $n $dir median=${ts.sorted.apply(1)}%.2f " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

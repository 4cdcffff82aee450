package graft

/** Standing 10× scale smoke — the per-round no-hidden-quadratic gate
  * (round-7 verdict item 7). Runs an arbitrary query list from
  * [[SparkEntry.queries]] at the driver's sf0.1 testdata and at a
  * [[ScaleUp]]-generated 10× fixture back-to-back (3 runs each, full
  * result hash-fold like Bench so map-only queries cannot degenerate to
  * bare scans), brackets each window with the Bench calibration probe,
  * and prints a BASELINE.md-ready ratio table. A ratio near ~100× at 10×
  * data is a quadratic regression; ≈10× is the linear-by-design profile;
  * below that, sf0.1 fixed overheads amortized. Timing-only — correctness
  * stays anchored to the DuckDB oracle at sf0.01.
  *
  * Usage: ScaleSmoke <sfDir> <scaledDir> <q1,q2,...>
  * (driven by scripts/scale_smoke.sh, which rebuilds the fixture first).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleSmoke <sfDir> <scaledDir> <q1,q2,...>")
    val (sfDir, scaledDir, qcsv) = (args(0), args(1), args(2))
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = graft.engine.Sessions.get("graft-scalesmoke")
    spark.sparkContext.setLogLevel("WARN")
    val results = Seq(sfDir, scaledDir).map { dir =>
      val (_, probeMed) = Bench.probe(spark, 3)
      val meds = names.map { n =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir)
            .selectExpr("bit_xor(xxhash64(struct(*)))").collect()
          graft.engine.OpCache.release(spark)
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          (System.nanoTime() - t0) / 1e9
        }.sorted
        n -> ((ts(ts.size / 2), ts.head, ts.last))
      }
      (probeMed, meds.toMap)
    }
    val (p0, m0) = results(0)
    val (p1, m1) = results(1)
    println(f"[scale] probe medians: base=$p0%.3f s scaled=$p1%.3f s " +
      "(windows comparable when close)")
    println(s"| query | t($sfDir) med | t(10x) med | ratio at 10x | 10x spread (min-max) |")
    println("|---|---|---|---|---|")
    names.foreach { n =>
      val (a, _, _) = m0(n)
      val (b, bmin, bmax) = m1(n)
      println(f"| $n | $a%.2f s | $b%.2f s | ${b / a}%.1f | $bmin%.1f-$bmax%.1f s |")
    }
    // machine-readable recording (round-15: lets scale_smoke.sh GATE on
    // per-query ratios instead of a human reading the table)
    val qjson = names.map { n =>
      val (a, _, _) = m0(n)
      val (b, bmin, bmax) = m1(n)
      f""""$n":{"base_med":$a%.3f,"scaled_med":$b%.3f,""" +
        f""""ratio":${b / a}%.3f,"scaled_min":$bmin%.3f,"scaled_max":$bmax%.3f}"""
    }.mkString("{", ",", "}")
    println(
      f"""{"metric":"scale_smoke_10x","probe_base":$p0%.3f,""" +
        f""""probe_scaled":$p1%.3f,"queries":$qjson}""")
    spark.stop()
  }
}

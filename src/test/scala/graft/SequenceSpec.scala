package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sequence

/** Invariants for the sequence-analytics operators (the DuckDB oracle
  * pins exact values at sf0.01; these pin semantics).
  */
class SequenceSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("funnel on real data: monotone counts, conversion vs top, step-1 exact") {
    val rows = Sequence.funnel(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    val ns = rows.map(_.getLong(2))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), s"funnel widened: ${ns.toSeq}")
    assert(rows(0).getDouble(3) === 1.0 && rows(0).isNullAt(4))
    // step-1 count is exactly the distinct users with a 'view'
    val expect = graft.engine.Tables.events(spark, sf)
      .where(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(ns(0) === expect)
    // conversions consistent with the counts
    rows.drop(1).foreach { r =>
      val want = math.floor(r.getLong(2).toDouble / ns(0) * 1e6 + 0.5) / 1e6
      assert(r.getDouble(3) === want, s"conversion at step ${r.getInt(0)}")
    }
  }

  test("funnel semantics on a hand-built stream: strict ordering enforced") {
    import spark.implicits._
    // user 1: full ordered path; user 2: click BEFORE view (must not
    // convert past step 1); user 3: view only
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    Seq(
      (1L, 1L, "view", "2020-01-01 00:00:00"),
      (2L, 1L, "click", "2020-01-01 00:10:00"),
      (3L, 1L, "purchase", "2020-01-01 00:20:00"),
      (4L, 2L, "click", "2020-01-01 00:00:00"),
      (5L, 2L, "view", "2020-01-01 00:05:00"),
      (6L, 3L, "view", "2020-01-01 00:00:00"))
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_s").cast("timestamp").as("ts"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Sequence.funnel(spark, dir).collect().sortBy(_.getInt(0))
    assert(rows.map(_.getLong(2)).toSeq === Seq(3L, 1L, 1L),
      rows.mkString(", "))
    assert(rows(1).getDouble(4) === 600.0) // 10 min view→click
    assert(rows(2).getDouble(4) === 1200.0) // 20 min view→purchase
  }

  test("retention: offset-0 is the full cohort, counts are non-increasing nowhere above size") {
    val rows = Sequence.retention(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (cd, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.head.getInt(1) === 0, s"cohort $cd missing offset 0")
      val size = sorted.head.getLong(3)
      assert(sorted.head.getLong(2) === size, s"cohort $cd: offset 0 != size")
      assert(sorted.head.getDouble(4) === 1.0)
      sorted.foreach { r =>
        assert(r.getLong(2) <= size, s"cohort $cd offset ${r.getInt(1)} exceeds size")
        assert(r.getLong(3) === size)
      }
    }
    // cohort sizes partition the user base exactly
    val users = graft.engine.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.head.getLong(3)).sum === users)
  }

  test("survival: KM invariants — telescoping risk set, monotone curve, exact product") {
    val rows = Sequence.survivalCurve(spark, sf).collect()
      .sortBy(_.getInt(0))
    assert(rows.nonEmpty)
    // at-risk starts at the signed-up population and telescopes down by
    // that day's events + censorings
    val signups = graft.engine.Tables.events(spark, sf)
      .where(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.head.getLong(1) === signups)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) === a.getLong(1) - a.getLong(2) - a.getLong(3),
          s"risk set breaks at duration ${b.getInt(0)}")
      case _ =>
    }
    // the curve is non-increasing within [0, 1], and each row's value is
    // the running product of (1 - d/n) recomputed imperatively
    var s = 1.0
    var prev = 1.0
    rows.foreach { r =>
      s *= (1.0 - r.getLong(2).toDouble / r.getLong(1).toDouble)
      val rounded = math.floor(s * 1e6 + 0.5) / 1e6
      val got = r.getDouble(4)
      assert(got === rounded, s"survival at ${r.getInt(0)}")
      assert(got >= 0.0 && got <= prev + 1e-12)
      prev = got
    }
    // every duration consumed: the last risk set empties exactly
    val last = rows.last
    assert(last.getLong(1) - last.getLong(2) - last.getLong(3) === 0L)
  }

  test("transitions: rows are conditional distributions and pair counts match brute force") {
    val rows = Sequence.transitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val psum = rs.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"row $from sums to $psum")
    }
    // total transition count = events − users with ≥1 event
    val e = graft.engine.Tables.events(spark, sf)
    val expectTotal = e.count() - e.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expectTotal)
  }

  test("pathNll: brute-force recompute agrees exactly; uniform model bounds hold") {
    val got = Sequence.pathNll(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    // third derivation in plain JVM code: ordered per-user streams →
    // first-256 cut → MLE model → per-user in-order fold, 6 dp floor
    val ev = graft.engine.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tsl"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.sortBy(t => (t._2, t._3)).map(_._4).toSeq
    }
    val trans = byUser.toSeq.flatMap { case (u, types) =>
      types.zip(types.drop(1)).take(256).map { case (a, b) => (u, a, b) }
    }
    val nFt = trans.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    val nF = trans.groupBy(_._2).view.mapValues(_.size).toMap
    val expect = trans.groupBy(_._1).map { case (u, ts) =>
      val s = ts.foldLeft(0.0) { case (acc, (_, a, b)) =>
        acc + math.log(nFt((a, b)).toDouble / nF(a))
      }
      u -> (ts.size.toLong, math.floor(-s / ts.size * 1e6 + 0.5) / 1e6)
    }
    assert(got === expect, "pathNll diverged from the brute-force recompute")
    // NLL is nonnegative and capped by ln of the largest from-state mass
    // (every scored transition has p = n_ft/n_f ≥ 1/n_f)
    val maxNf = nF.values.max
    got.values.foreach { case (_, nll) =>
      assert(nll >= 0.0 && nll <= math.log(maxNf.toDouble) + 1e-9)
    }
  }

  test("attribution: single-credit models conserve revenue exactly, linear within floor slack") {
    val rows = Sequence.attribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val totalMicro = graft.engine.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(sum(floor(col("value") * 100 + lit(0.5)).cast("long") * 1000000L))
      .head().getLong(0)
    def byModel(m: String) = rows.filter(_._1 == m)
    // first/last give each purchase's FULL credit to exactly one channel:
    // the ledger sums to total purchase revenue, micro-cent exact
    for (m <- Seq("first_touch", "last_touch")) {
      assert(byModel(m).map(_._4).sum === totalMicro, s"$m ledger leaked")
      // ...and one credit per purchase
      val nPurchases = graft.engine.Tables.events(spark, sf)
        .where(col("event_type") === "purchase").count()
      assert(byModel(m).map(_._3).sum === nPurchases, s"$m credit count")
    }
    // linear floors each share, losing < n_touches micro-units per
    // purchase — bounded below by total minus the credit count
    val linear = byModel("linear")
    val linSum = linear.map(_._4).sum
    val linCredits = linear.map(_._3).sum
    assert(linSum <= totalMicro && linSum > totalMicro - linCredits,
      s"linear ledger out of floor slack: $linSum vs $totalMicro (credits $linCredits)")
    // the three models agree exactly on the untouched 'none' channel
    val nones = rows.filter(_._2 == "none").map(t => (t._3, t._4)).distinct
    assert(nones.length === 1, s"models disagree on unattributed purchases: $nones")
  }

  test("topPaths: paths are capped type sequences consistent with the session table") {
    val paths = Sequence.topPaths(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(paths.nonEmpty)
    val types = Set("view", "click", "purchase", "signup", "error")
    paths.foreach { case (p, n) =>
      val segs = p.split(">")
      assert(segs.nonEmpty && segs.length <= 8, s"path over cap: $p")
      assert(segs.forall(types), s"unknown event type in path: $p")
      assert(n >= 1L)
    }
    // counts are (desc, path asc)-ordered and bounded by the session count
    val ns = paths.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    val totalSessions = Sequence.sessions(spark, sf).count()
    assert(ns.sum <= totalSessions)
    // if the whole path domain fits in the cut, the counts partition it
    if (paths.length < 20) assert(ns.sum === totalSessions)
  }

  test("topPaths: one giant bot session is pre-cut, result identical to the brute-force head") {
    import spark.implicits._
    // user 1: a 50k-event bot session (every event 1s apart — one
    // island); users 2..4: small ordinary sessions. The row_number
    // pre-cut must bound the collect_list buffer to maxLen structs per
    // session while producing exactly the first-8-by-(us, event_id)
    // path the unbounded slice form produced.
    val dir = java.nio.file.Files.createTempDirectory("graft-bigsession").toString
    val base = java.sql.Timestamp.valueOf("2020-01-01 00:00:00").getTime
    val types = Array("view", "click", "purchase", "error", "signup")
    val bot = (0 until 50000).map { i =>
      (i.toLong, 1L, types(i % types.length), new java.sql.Timestamp(base + i * 1000L))
    }
    val small = Seq(
      (100000L, 2L, "view", new java.sql.Timestamp(base)),
      (100001L, 2L, "click", new java.sql.Timestamp(base + 60000L)),
      (100002L, 3L, "view", new java.sql.Timestamp(base)),
      (100003L, 3L, "click", new java.sql.Timestamp(base + 60000L)),
      (100004L, 4L, "signup", new java.sql.Timestamp(base)))
    (bot ++ small).toDF("event_id", "user_id", "event_type", "ts")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .repartition(4) // scatter the giant session across input splits
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Sequence.topPaths(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    // brute-force expectation: first 8 events of each session by
    // (us, event_id); the bot session's head is types cycled 8 long
    val botPath = (0 until 8).map(i => types(i % types.length)).mkString(">")
    val expect = Seq("view>click" -> 2L, botPath -> 1L, "signup" -> 1L)
      .sortBy { case (p, n) => (-n, p) }
    assert(got === expect, s"got ${got.mkString(", ")}")
    // and the plan carries the pre-cut: a Filter on rn sits below the
    // aggregate, so no unbounded per-session buffer exists
    val plan = Sequence.topPaths(spark, dir).queryExecution.optimizedPlan.toString
    assert(plan.contains("row_number"), "pre-cut window missing from plan")
  }

  test("markovStationary: JVM power-iteration recompute; mass is conserved") {
    val got = Sequence.markovStationary(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // third derivation: transitions + the identical ordered folds
    val ev = graft.engine.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map { r =>
        val t = r.getTimestamp(1)
        // full-precision ordering key (getTime alone truncates sub-ms)
        (r.getLong(0), (t.getTime / 1000) * 1000000000L + t.getNanos,
          r.getLong(2), r.getString(3))
      }
    val pairs = ev.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._2, r._3)).map(_._4)
      s.zip(s.drop(1))
    }.toSeq
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val p = counts.map { case ((f, t), n) => (f, t) -> n.toDouble / rowTot(f) }
    val states = ev.map(_._4).distinct.sorted
    def r9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    var pi = states.map(_ -> 1.0 / states.size).toMap
    (1 to 5).foreach { _ =>
      pi = states.map { j =>
        val terms = states.sorted.flatMap { i =>
          p.get((i, j)).map(pij => pi(i) * pij)
        }
        j -> (if (terms.isEmpty) 0.0 else r9(terms.foldLeft(0.0)(_ + _)))
      }.toMap
    }
    val expect = pi.map { case (s, v) => s -> r6(v) }
    assert(got === expect, "stationary distribution diverged")
    // probability mass conserved to the rounding budget
    val mass = got.values.sum
    assert(math.abs(mass - 1.0) <= got.size * 1e-5 + 1e-9, s"mass $mass")
  }
}

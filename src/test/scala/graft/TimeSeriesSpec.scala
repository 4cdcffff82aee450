package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** Invariants for the time-series fill/rolling/decay operators — scale-free
  * properties plus a brute-force recompute of each math path on the
  * testdata series (the DuckDB oracle pins exact values at sf0.01; this
  * pins the SEMANTICS at any SF).
  */
class TimeSeriesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private lazy val interp = TimeSeries.dailyInterpolated(spark, sf).collect()

  test("interpolated spine is dense and keyed: every (priority, calendar day) exactly once") {
    val priorities = interp.map(_.getString(0)).distinct
    val days = interp.map(_.getString(1)).distinct
    assert(days.length === 59) // 1997-01-01 .. 1997-02-28
    assert(interp.length === priorities.length * days.length)
    assert(interp.map(r => (r.getString(0), r.getString(1))).distinct.length
      === interp.length)
  }

  test("interpolation semantics: brute-force recompute per series agrees row-for-row") {
    val bySeries = interp.groupBy(_.getString(0))
    bySeries.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getString(1))
      val obs = sorted.zipWithIndex.collect {
        case (r, i) if !r.isNullAt(3) => (i, r.getDouble(3))
      }
      sorted.zipWithIndex.foreach { case (r, i) =>
        val prev = obs.filter(_._1 <= i).lastOption
        val nxt = obs.find(_._1 >= i)
        def close(a: Double, b: Double) = math.abs(a - b) < 1e-6
        (r.isNullAt(4), prev) match {
          case (true, None) => // leading null: ok
          case (false, Some((_, pv))) => assert(close(r.getDouble(4), pv))
          case other => fail(s"locf mismatch at $i: $other")
        }
        (r.isNullAt(5), nxt) match {
          case (true, None) =>
          case (false, Some((_, nv))) => assert(close(r.getDouble(5), nv))
          case other => fail(s"nocb mismatch at $i: $other")
        }
        (prev, nxt) match {
          case (Some((pi, pv)), Some((ni, nv))) =>
            val expect =
              if (pi == ni) pv
              else pv + (nv - pv) * (i - pi).toDouble / (ni - pi).toDouble
            assert(close(r.getDouble(6), expect),
              s"interp at $i: got ${r.getDouble(6)}, want $expect")
          case _ => assert(r.isNullAt(6), s"interp should be null at edge $i")
        }
      }
    }
  }

  test("rolling RANGE window counts calendar days, not observations") {
    val rows = TimeSeries.rollingRange(spark, sf).collect()
    val bySeries = rows.groupBy(_.getString(0))
    bySeries.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getString(1))
      val days = sorted.map(r => java.time.LocalDate.parse(r.getString(1)))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val inWin = days.zipWithIndex.filter { case (d, _) =>
          !d.isAfter(days(i)) && !d.isBefore(days(i).minusDays(6))
        }.map(_._2)
        assert(r.getLong(5) === inWin.length.toLong,
          s"roll7_days at ${r.getString(1)}")
        val expectRev = inWin.map(j => sorted(j).getDouble(2)).sum
        assert(math.abs(r.getDouble(3) - expectRev) < 1e-6,
          s"roll7_rev at ${r.getString(1)}")
      }
    }
  }

  test("ewma: sequential 2^-gap fold recomputed imperatively agrees bit-for-bit pre-rounding") {
    val rows = TimeSeries.ewma(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getString(1))
      val days = sorted.map(r => java.time.LocalDate.parse(r.getString(1)))
      var acc = 0.0
      var accDay: java.time.LocalDate = null
      sorted.zipWithIndex.foreach { case (r, i) =>
        val v = r.getDouble(2) // v_raw rounded 6dp — fold below re-derives
        // the fold runs on the UNROUNDED base; recompute from v_raw's
        // 6dp-rounded value is not bit-exact, so recompute the fold from
        // the same rounded inputs and allow 1e-5 slack
        if (i == 0) { acc = v; accDay = days(0) }
        else {
          val gap = java.time.temporal.ChronoUnit.DAYS.between(accDay, days(i))
          val w = 1.0 / (1L << gap).toDouble
          acc = w * acc + (1.0 - w) * v
          accDay = days(i)
        }
        assert(math.abs(r.getDouble(3) - acc) < 1e-4,
          s"ewma at ${r.getString(1)}: got ${r.getDouble(3)}, want $acc")
      }
    }
  }

  test("anomalies: brute-force trailing-MAD recompute agrees row-for-row") {
    val rows = TimeSeries.anomalies(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_.getString(1))
      assert(sorted.length === 59, s"spine not dense for $p")
      val n = sorted.map(_.getLong(2))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val hist = n.slice(math.max(0, i - 14), i).sorted
        val cnt = hist.length
        if (cnt < 8) {
          assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
            s"warm-up row flagged at ($p, ${r.getString(1)})")
        } else {
          val m2 = hist((cnt + 1) / 2 - 1) + hist(cnt / 2)
          val sdev = hist.map(x => math.abs(x * 2 - m2)).sorted
          val mad4 = sdev((cnt + 1) / 2 - 1) + sdev(cnt / 2)
          assert(r.getDouble(3) === m2 / 2.0, s"med at ($p, ${r.getString(1)})")
          assert(r.getDouble(4) === mad4 / 4.0, s"mad at ($p, ${r.getString(1)})")
          val flag = math.abs(n(i) * 2 - m2) * 4 > mad4 * 7
          assert(r.getBoolean(5) === flag, s"flag at ($p, ${r.getString(1)})")
        }
      }
    }
  }

  test("acf: brute-force recompute from the zero-filled series agrees at every lag") {
    // anomalies exposes the identical zero-filled daily series — reuse it
    // as the reference input rather than re-deriving the spine here.
    val series = TimeSeries.anomalies(spark, sf).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.sortBy(_.getString(1)).map(_.getLong(2).toDouble)).toMap
    val rows = TimeSeries.acf(spark, sf).collect()
    assert(rows.nonEmpty)
    val seen = rows.map(r => (r.getString(0), r.getInt(1))).toSet
    assert(seen === series.keySet.flatMap(p => (1 to 7).map(k => (p, k))),
      "every (priority, lag 1..7) exactly once")
    rows.foreach { r =>
      val (p, k) = (r.getString(0), r.getInt(1))
      val x = series(p)
      val t = x.length
      val pairsN = t - k
      assert(r.getLong(2) === pairsN.toLong, s"n_pairs at ($p, $k)")
      val mean = x.sum / t
      val spp = (k until t).map(i => x(i) * x(i - k)).sum
      val s1 = (k until t).map(x).sum
      val s2 = (k until t).map(i => x(i - k)).sum
      val sxx = x.map(v => v * v).sum
      val expect = (spp - mean * (s1 + s2) + pairsN * mean * mean) /
        (sxx - t * mean * mean)
      assert(math.abs(r.getDouble(3) - expect) < 1e-5,
        s"acf at ($p, $k): got ${r.getDouble(3)}, want $expect")
    }
  }

  test("cusum: imperative recompute agrees; planted step shift alarms exactly in the run") {
    // real-data recompute: the operator's folds must equal a plain loop
    val rows = TimeSeries.cusum(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_.getString(1))
      val n = sorted.map(_.getLong(2))
      val nTot = n.length.toLong
      val sTot = n.sum
      var up = 0L; var dn = 0L
      sorted.zipWithIndex.foreach { case (r, i) =>
        up = math.max(0L, up + n(i) * 2 * nTot - 3 * sTot)
        dn = math.max(0L, dn + sTot - n(i) * 2 * nTot)
        assert(r.getLong(3) === up, s"cusum_up at ($p, ${r.getString(1)})")
        assert(r.getLong(4) === dn, s"cusum_dn at ($p, ${r.getString(1)})")
        assert(r.getBoolean(5) === (up > 4 * sTot))
        assert(r.getBoolean(6) === (dn > 4 * sTot))
      }
    }
    // planted fixture: 20 quiet days at 10 then a step to 40 — the up
    // alarm must fire inside the shifted run and never in the quiet head;
    // the mirrored collapse fixture must fire only the down alarm
    import spark.implicits._
    def series(vals: Seq[Long], key: String) =
      vals.zipWithIndex.map { case (v, i) =>
        (key, java.sql.Date.valueOf(java.time.LocalDate
          .of(2020, 1, 1).plusDays(i.toLong)), v)
      }
    val surge = series(Seq.fill(20)(10L) ++ Seq.fill(10)(40L), "surge")
    val crash = series(Seq.fill(20)(40L) ++ Seq.fill(10)(0L), "crash")
    val out = TimeSeries.cusumFromSeries(
      (surge ++ crash).toDF("priority", "day", "n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(5), r.getBoolean(6)))
    val surgeRows = out.filter(_._1 == "surge").sortBy(_._2)
    assert(!surgeRows.take(20).exists(_._3), "up alarm in the quiet head")
    assert(surgeRows.drop(20).exists(_._3), "up alarm never fired on the surge")
    assert(!surgeRows.exists(_._4), "down alarm on a pure surge")
    val crashRows = out.filter(_._1 == "crash").sortBy(_._2)
    assert(!crashRows.take(20).exists(_._4), "down alarm in the elevated head")
    assert(crashRows.drop(20).exists(_._4), "down alarm never fired on the crash")
    assert(!crashRows.exists(_._3), "up alarm on a pure collapse")
  }

  test("holt: imperative (level, trend) recurrence agrees row-for-row") {
    val rows = TimeSeries.holt(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_.getString(1))
      assert(sorted.length === 59, s"spine not dense for $p")
      var l = 0.0; var b = 0.0
      sorted.zipWithIndex.foreach { case (r, i) =>
        val y = r.getLong(2).toDouble
        if (i == 0) { l = y; b = 0.0 }
        else {
          val lNew = 0.5 * y + 0.5 * (l + b)
          b = 0.25 * (lNew - l) + 0.75 * b
          l = lNew
        }
        // inputs are integer counts and α/β are dyadic, so the fold is
        // exact in binary64 — only the 6-dp output rounding separates us
        assert(math.abs(r.getDouble(3) - l) < 1e-5,
          s"level at ($p, ${r.getString(1)}): got ${r.getDouble(3)}, want $l")
        assert(math.abs(r.getDouble(4) - b) < 1e-5,
          s"trend at ($p, ${r.getString(1)}): got ${r.getDouble(4)}, want $b")
        assert(math.abs(r.getDouble(5) - (l + b)) < 1e-5,
          s"forecast at ($p, ${r.getString(1)})")
      }
    }
  }

  test("holt-winters: imperative (level, trend, seasonal[7]) recurrence agrees row-for-row") {
    val rows = TimeSeries.holtWinters(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_.getString(1))
      assert(sorted.length === 59, s"spine not dense for $p")
      var l = 0.0; var b = 0.0
      val s = Array.fill(7)(0.0)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val y = r.getLong(2).toDouble
        val dow = i % 7 // spine starts 1997-01-01, the dow epoch
        if (i == 0) { l = y; b = 0.0 }
        else {
          val lNew = 0.5 * (y - s(dow)) + 0.5 * (l + b)
          b = 0.25 * (lNew - l) + 0.75 * b
          s(dow) = 0.25 * (y - lNew) + 0.75 * s(dow)
          l = lNew
        }
        assert(math.abs(r.getDouble(3) - l) < 1e-5,
          s"level at ($p, ${r.getString(1)}): got ${r.getDouble(3)}, want $l")
        assert(math.abs(r.getDouble(4) - b) < 1e-5,
          s"trend at ($p, ${r.getString(1)})")
        assert(math.abs(r.getDouble(5) - s(dow)) < 1e-5,
          s"seasonal at ($p, ${r.getString(1)})")
        assert(math.abs(r.getDouble(6) - (l + b + s((dow + 1) % 7))) < 1e-5,
          s"forecast at ($p, ${r.getString(1)})")
      }
    }
  }

  test("forecast eval: MAE/RMSE recomputed from the model outputs agree") {
    val got = TimeSeries.forecastEval(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.nonEmpty)
    def recompute(model: String, out: Array[org.apache.spark.sql.Row]): Unit =
      out.groupBy(_.getString(0)).foreach { case (p, rs) =>
        val sorted = rs.sortBy(_.getString(1))
        val errs = sorted.dropRight(1).zipWithIndex.collect {
          // forecast_next is the LAST column of both model outputs
          case (r, i) if i + 1 > 7 =>
            r.getDouble(r.length - 1) - sorted(i + 1).getLong(2).toDouble
        }
        val (n, mae, rmse) = got((model, p))
        assert(n === errs.length.toLong, s"n_eval for ($model, $p)")
        assert(math.abs(mae - errs.map(math.abs).sum / errs.length) < 1e-5,
          s"mae for ($model, $p)")
        assert(math.abs(rmse -
          math.sqrt(errs.map(e => e * e).sum / errs.length)) < 1e-5,
          s"rmse for ($model, $p)")
      }
    recompute("holt", TimeSeries.holt(spark, sf).collect())
    recompute("holt_winters", TimeSeries.holtWinters(spark, sf).collect())
    assert(got.keySet.map(_._1) === Set("holt", "holt_winters"))
  }

  test("seasonal decomposition: identity, dense spine, mass-balanced seasonal") {
    val rows = TimeSeries.seasonalDecompose(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // dense spine: every (priority, calendar day) exactly once
    val keys = rows.map(t => (t._1, t._2))
    assert(keys.length === keys.distinct.length, "spine has duplicates")
    val daysPerKey = rows.groupBy(_._1).view.mapValues(_.length).toMap
    assert(daysPerKey.values.toSet === Set(59), s"spine not dense: $daysPerKey")
    rows.foreach { case (p, d, n, trend, seasonal, resid) =>
      // the decomposition identity holds by construction against the
      // ROUNDED components (resid is defined as the rounded remainder)
      assert(math.abs(n - trend - seasonal - resid) < 2e-6,
        s"identity broken at ($p, $d): $n != $trend + $seasonal + $resid")
      assert(trend >= 0.0, "a centered mean of counts cannot be negative")
    }
    // seasonal is a deviation from each series' own mean: weighted by
    // day-of-week frequency it cancels to ~0 per priority (exact pre-
    // rounding; 59 days × 1e-6 rounding slack after)
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val s = rs.map(_._5).sum
      assert(math.abs(s) < 1e-4, s"seasonal mass not balanced for $p: $s")
    }
  }
}
// NOTE: plan-shape guards (no unpartitioned windows, no cartesian
// products) come free from PlanSpec's sweep over SparkEntry.queries,
// which includes all ts_* registrations.

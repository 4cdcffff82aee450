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
// which includes the three ts_* registrations.

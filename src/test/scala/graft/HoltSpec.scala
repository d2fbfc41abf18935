package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DailySeries

/** Holt linear-trend smoothing ([[DailySeries.holt]]): exact
  * invariants on linear and constant series, the forecast fan, SES
  * degradation at beta = 0, hand-recursion parity, refusals, and
  * partitioning invariance.
  */
class HoltSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(i: Int): Date = Date.valueOf(f"2024-01-${i}%02d")

  private def series(vals: Seq[Long]) =
    vals.zipWithIndex.map { case (v, i) => (d(i + 1), v) }
      .toDF("day", "rev")

  test("exactly linear series: fit is exact, trend is the slope invariantly") {
    // x_t = 100 + 5t: init level = x_0, trend = 5 → level_t = x_t and
    // trend stays 5 for ALL alpha/beta (the Holt fixed point)
    val rows = DailySeries.holt(series((0 to 9).map(t => 100L + 5 * t)),
      alpha = 0.3, beta = 0.2, horizon = 3).collect()
    val (fits, fcs) = rows.partition(!_.getBoolean(5))
    assert(fits.length == 9 && fcs.length == 3)
    fits.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble, r.toString) // fit == actual
      assert(r.getDouble(4) == 5.0) // trend
    }
    // forecast fan: last level 145 + h·5
    assert(fcs.map(_.getDouble(2)).toSeq == Seq(150.0, 155.0, 160.0))
    assert(fcs.map(_.getDate(0)).toSeq ==
      Seq(d(11), d(12), d(13)))
    fcs.foreach(r => assert(r.isNullAt(1)))
  }

  test("constant series: zero trend, exact fit, flat forecasts") {
    val rows = DailySeries.holt(series(Seq.fill(6)(42L))).collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == 42.0 && r.getDouble(4) == 0.0, r.toString)
    }
  }

  test("beta = 0 degrades to simple exponential smoothing exactly") {
    val vals = Seq(10L, 12L, 9L, 15L, 11L, 14L)
    val rows = DailySeries.holt(series(vals), alpha = 0.4, beta = 0.0)
      .collect().filter(!_.getBoolean(5))
    // SES with init level = x_0, trend = x_1 − x_0 frozen: level
    // recursion keeps the constant trend term — replay by hand
    var level = vals.head.toDouble
    val trend = (vals(1) - vals.head).toDouble
    vals.drop(1).zip(rows).foreach { case (x, r) =>
      val fit = level + trend
      level = 0.4 * x + 0.6 * (level + trend)
      assert(math.abs(r.getDouble(2) - fit) < 1e-6, r.toString)
    }
  }

  test("hand-recursion parity on an irregular series") {
    val vals = Seq(100L, 80L, 130L, 90L, 140L, 120L, 160L)
    val rows = DailySeries.holt(series(vals), alpha = 0.2, beta = 0.1,
      horizon = 2).collect()
    var level = 100.0
    var trend = -20.0
    val expect = vals.drop(1).map { x =>
      val fit = level + trend
      val nl = 0.2 * x + 0.8 * (level + trend)
      trend = 0.1 * (nl - level) + 0.9 * trend
      level = nl
      fit
    }
    val (fits, fcs) = rows.partition(!_.getBoolean(5))
    fits.map(_.getDouble(2)).zip(expect).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6, s"$got vs $want")
    }
    assert(math.abs(fcs(0).getDouble(2) - (level + trend)) < 1e-5)
    assert(math.abs(fcs(1).getDouble(2) - (level + 2 * trend)) < 1e-5)
  }

  test("refusals: short series, cap, bad smoothing params") {
    intercept[IllegalArgumentException] {
      DailySeries.holt(series(Seq(1L)))
    }
    val e = intercept[IllegalArgumentException] {
      DailySeries.holt(series(Seq(1L, 2L, 3L)), maxDays = 2L)
    }
    assert(e.getMessage.contains("maxDays"))
    intercept[IllegalArgumentException] {
      DailySeries.holt(series(Seq(1L, 2L)), alpha = 0.0)
    }
  }

  test("partitioning invariance: identical bits at any layout") {
    val vals = (1 to 30).map(i => (i * 17 % 50 + 10).toLong)
    def run(parts: Int): Seq[String] =
      DailySeries.holt(series(vals).repartition(parts))
        .collect().map(_.toString).toSeq
    assert(run(1) == run(7))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DailySeries

/** Holt–Winters additive seasonal ([[DailySeries.holtWinters]]):
  * hand replay of the recursion, the 7-periodic fixed point, the
  * constant-series degeneracy, frozen seasonals at γ=0, forecast
  * seasonal cycling, refusals.
  */
class HoltWintersSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def daily(vals: Seq[Long]) =
    vals.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(1995, 1, 2).plusDays(i)), v)
    }.toDF("day", "rev")

  test("hand replay: the operator matches a plain-Scala recursion") {
    val xs = Seq[Long](100, 120, 90, 80, 110, 130, 95,
      105, 125, 93, 86, 112, 136, 99, 111, 131)
    val (a, b, g) = (0.3, 0.2, 0.4)
    // reference recursion
    val m1 = xs.take(7).map(_.toDouble).sum / 7.0
    var lvl = m1
    var tr = (xs.slice(7, 14).map(_.toDouble).sum / 7.0 - m1) / 7.0
    val s = xs.take(7).map(_.toDouble - m1).toArray
    val wantFits = (7 until xs.length).map { t =>
      val st = s(t % 7)
      val fit = lvl + tr + st
      val nl = a * (xs(t) - st) + (1 - a) * (lvl + tr)
      tr = b * (nl - lvl) + (1 - b) * tr
      lvl = nl
      s(t % 7) = g * (xs(t) - nl) + (1 - g) * st
      BigDecimal(fit).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = DailySeries.holtWinters(daily(xs), alpha = a, beta = b,
        gamma = g, horizon = 3)
      .orderBy("day").collect()
    val fits = got.filter(!_.getAs[Boolean]("is_forecast"))
      .map(_.getAs[Double]("fit")).toSeq
    assert(fits == wantFits, s"$fits vs $wantFits")
    // forecast fan: level + h·trend + cyclic seasonal
    val fc = got.filter(_.getAs[Boolean]("is_forecast"))
    assert(fc.length == 3 && fc.forall(_.isNullAt(1)))
    val lastT = xs.length - 1
    fc.zipWithIndex.foreach { case (r, i) =>
      val h = i + 1
      val want = BigDecimal(lvl + h * tr + s((lastT + h) % 7))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("fit") == want, r.toString)
    }
  }

  test("a purely 7-periodic series is a FIXED POINT: every fit exact, " +
      "zero trend, forecasts repeat the pattern") {
    val pattern = Seq[Long](70, 110, 90, 130, 80, 120, 100)
    val xs = Seq.fill(4)(pattern).flatten // 28 days
    val got = DailySeries.holtWinters(daily(xs), horizon = 7)
      .orderBy("day").collect()
    got.filter(!_.getAs[Boolean]("is_forecast")).foreach { r =>
      assert(r.getAs[Double]("fit") == r.getAs[Long]("actual_cents").toDouble,
        r.toString)
      assert(r.getAs[Double]("trend") == 0.0)
    }
    // 28 % 7 == 0: the h-th forecast is the pattern's (h−1)-th slot
    val fc = got.filter(_.getAs[Boolean]("is_forecast"))
      .map(_.getAs[Double]("fit")).toSeq
    assert(fc == pattern.map(_.toDouble), fc.toString)
  }

  test("constant series degrades exactly: zero trend and seasonals") {
    val got = DailySeries.holtWinters(daily(Seq.fill(21)(500L)), horizon = 2)
      .collect()
    got.foreach { r =>
      assert(r.getAs[Double]("fit") == 500.0 &&
        r.getAs[Double]("trend") == 0.0 &&
        r.getAs[Double]("seasonal") == 0.0, r.toString)
    }
  }

  test("gamma = 0 freezes the seeded weekly profile") {
    val pattern = Seq[Long](10, 20, 30, 40, 50, 60, 70)
    val xs = Seq.fill(3)(pattern).flatten
    val got = DailySeries.holtWinters(daily(xs), gamma = 0.0)
      .orderBy("day").collect()
      .filter(!_.getAs[Boolean]("is_forecast"))
    val m1 = pattern.map(_.toDouble).sum / 7.0
    got.zipWithIndex.foreach { case (r, i) =>
      val t = i + 7
      assert(r.getAs[Double]("seasonal") == pattern(t % 7) - m1, r.toString)
    }
  }

  test("refusals: short series, parameter range, maxDays cap") {
    val e1 = intercept[IllegalArgumentException] {
      DailySeries.holtWinters(daily(Seq.fill(13)(1L)))
    }
    assert(e1.getMessage.contains("14"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DailySeries.holtWinters(daily(Seq.fill(14)(1L)), alpha = 0.0)
    }
    assert(e2.getMessage.contains("alpha"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      DailySeries.holtWinters(daily(Seq.fill(20)(1L)), maxDays = 15L)
    }
    assert(e3.getMessage.contains("maxDays"), e3.getMessage)
  }

  test("refusal: a gap in the daily series (t % 7 would rotate)") {
    // 15 days with day index 7 missing: span 16, count 15
    val rows = (0 until 16).filter(_ != 7).map { i =>
      (java.sql.Date.valueOf(
        java.time.LocalDate.of(1995, 1, 2).plusDays(i)), 100L)
    }.toDF("day", "rev")
    val e = intercept[IllegalArgumentException] {
      DailySeries.holtWinters(rows)
    }
    assert(e.getMessage.contains("gaps or duplicate days"), e.getMessage)
  }

  test("refusal: a duplicated day, even when a gap masks the span") {
    // duplicate day 3 AND drop day 9: span 14, count 14 — the span
    // check alone would pass; distinctness catches it
    val idx = (0 until 14).filter(_ != 9) :+ 3
    val rows = idx.map { i =>
      (java.sql.Date.valueOf(
        java.time.LocalDate.of(1995, 1, 2).plusDays(i)), 100L)
    }.toDF("day", "rev")
    val e = intercept[IllegalArgumentException] {
      DailySeries.holtWinters(rows)
    }
    assert(e.getMessage.contains("gaps or duplicate days"), e.getMessage)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Benford, DailySeries}

/** Benford first-digit test ([[Benford.test]]) and the weekday
  * seasonal profile ([[DailySeries.weekdayProfile]]): exact-integer
  * parity with an independent BigInt replay, screen behavior on
  * conformant vs uniform data, structural zeros, filters, and hand
  * seasonal values.
  */
class BenfordSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("per-digit terms match an independent BigInt replay exactly") {
    val vals = (1L to 9L) :+ 1L // digit 1 twice, 2..9 once
    val got = Benford.test(vals.toDF("v"), "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getAs[Long]("term_ppm"),
        r.getAs[Long]("chi2_ppm")))
    val n = BigInt(10)
    val expect = Benford.expectedPpm.map { case (d, p) =>
      val o = BigInt(if (d == 1) 2 else 1)
      val num = (o * 1000000 - n * p).pow(2) * 1000000
      (d, num / (n * p * 1000000))
    }.toMap
    val totalExpected = expect.values.sum
    got.foreach { case (d, o, term, total) =>
      assert(BigInt(term) == expect(d), s"digit $d")
      assert(BigInt(total) == totalExpected)
      assert(o == (if (d == 1) 2L else 1L))
    }
  }

  test("screen behavior: geometric data conforms, uniform data fires") {
    // powers of 2 are a classic Benford-conformant sequence
    val conformant = (0 until 300).map(k => BigInt(2).pow(k % 60).toLong)
      .filter(_ > 0)
    val uniform = (100L to 999L)
    val c = Benford.test(conformant.toDF("v"), "v")
      .head().getAs[Double]("chi2")
    val u = Benford.test(uniform.toDF("v"), "v")
      .head().getAs[Double]("chi2")
    assert(c < u / 10, s"conformant $c vs uniform $u")
  }

  test("all 9 digit rows appear even when digits are missing; non-positive filtered") {
    val got = Benford.test(Seq(9L, 90L, 900L, 0L, -5L).toDF("v"), "v")
      .collect()
    assert(got.length == 9)
    val byDigit = got.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit(9) == 3L && (1 to 8).forall(byDigit(_) == 0L))
    assert(got.head.getAs[Long]("n") == 3L)
  }

  test("partitioning invariance") {
    val vals = (1 to 500).map(i => (i * 7919L) % 99991L + 1)
    def run(parts: Int) =
      Benford.test(vals.toDF("v").repartition(parts), "v")
        .collect().map(_.toString).toSeq
    assert(run(1) == run(13))
  }

  // ---- weekday seasonal profile ----

  private def d(i: Int) = java.sql.Date.valueOf(f"2024-01-${i}%02d")

  test("weekday profile: constant series has a zero profile on full windows") {
    val daily = (1 to 14).map(i => (d(i), 70L)).toDF("day", "rev")
    val got = DailySeries.weekdayProfile(daily).collect()
    assert(got.length == 7)
    got.foreach { r =>
      assert(r.getAs[Long]("sum_d7") == 0L, r.toString)
      assert(r.getAs[Double]("seasonal_dollars") == 0.0)
    }
    // 14 days → full windows are days 4..11: 8 days, Thursday twice
    val n = got.map(r => r.getAs[Long]("dow") -> r.getAs[Long]("n_days")).toMap
    assert(n(3L) == 2L && n.values.sum == 8L)
  }

  test("weekday profile: a Monday spike lands on dow 0 with hand values") {
    // 2024-01-01 is a Monday; spike 2024-01-08 (also a Monday) to 140
    val daily = (1 to 14).map(i => (d(i), if (i == 8) 140L else 70L))
      .toDF("day", "rev")
    val got = DailySeries.weekdayProfile(daily).collect()
      .map(r => r.getAs[Long]("dow") ->
        ((r.getAs[Long]("sum_d7"), r.getAs[Double]("seasonal_dollars"))))
      .toMap
    // day 8: d7 = 7·140 − 560 = 420; its six full-window neighbours
    // get −70; day 4's window misses the spike → 0
    assert(got(0L) == ((420L, 0.6)), got.toString)   // Monday
    assert(got(3L) == ((-70L, -0.05)))               // Thursday: 0 + (−70), n=2
    assert(got(4L) == ((-70L, -0.1)))                // Friday
  }
}

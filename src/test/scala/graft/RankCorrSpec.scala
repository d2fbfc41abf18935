package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankCorr

/** Per-group Spearman ([[RankCorr.spearman]]): hand values with
  * ties (vs the textbook midrank computation), the ±1 monotone
  * extremes, degenerate-group nulls, per-group isolation and
  * partitioning invariance.
  */
class RankCorrSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rho(rows: Seq[(String, Long, Long)], parts: Int = 1)
      : Map[String, Option[Double]] = {
    val df0 = rows.toDF("g", "x", "y")
    val df = if (parts > 1) df0.repartition(parts) else df0
    RankCorr.spearman(df, "g", "x", "y")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
  }

  test("tied midranks match the textbook value") {
    // ranks x: 1, 2.5, 2.5, 4; y: 1, 2, 3.5, 3.5 → ρ = 3.75/4.5 = 0.8(3)
    val got = rho(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 2L, 30L),
      ("a", 3L, 30L)))
    assert(got("a").contains(0.833333), got.toString)
  }

  test("monotone extremes and degenerate groups") {
    val got = rho(Seq(
      ("up", 1L, 5L), ("up", 2L, 6L), ("up", 3L, 9L),
      ("down", 1L, 9L), ("down", 2L, 6L), ("down", 3L, 5L),
      ("const", 1L, 7L), ("const", 2L, 7L), ("const", 3L, 7L),
      ("single", 4L, 4L)))
    assert(got("up").contains(1.0))
    assert(got("down").contains(-1.0))
    assert(got("const").isEmpty)   // zero y-variance → null
    assert(got("single").isEmpty)  // n = 1 → null
  }

  test("groups are isolated and partitioning is invisible") {
    val rows = (1L to 40L).map(i => ("g" + (i % 4),
      i * 7 % 13, (i * i * 3 + i) % 17))
    val one = rho(rows)
    assert(rho(rows, parts = 11) == one)
    // shuffled row order too
    assert(rho(scala.util.Random.shuffle(rows), parts = 5) == one)
  }

  test("wilcoxon signed-rank: hand values, ties, zero diffs dropped, invariance") {
    def w(rows: Seq[(String, Long)], parts: Int = 1)
        : Map[String, (Long, Long, Double)] = {
      val df0 = rows.toDF("g", "d")
      val df = if (parts > 1) df0.repartition(parts) else df0
      RankCorr.wilcoxonSignedRank(df, "g", "d")
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    }
    // no ties: d = +1,-2,+3,-4,+5 -> ranks 1..5, W+ = 1+3+5 = 9,
    // z = (9 - 7.5)/sqrt(5*6*11/24) = 0.404520
    val plain = Seq(("a", 1L), ("a", -2L), ("a", 3L), ("a", -4L), ("a", 5L))
    assert(w(plain)("a") == ((5L, 18L, 0.40452)), w(plain).toString)
    // ties: d = 2,2,-2,1 -> |d| ranks 1 and midrank-3 triple,
    // W+ = 1+3+3 = 7, 48var = 2*4*5*9 - 24 = 336, z = 2/sqrt(7)
    val tied = Seq(("t", 2L), ("t", 2L), ("t", -2L), ("t", 1L))
    assert(w(tied)("t") == ((4L, 14L, 0.755929)), w(tied).toString)
    // zero differences are dropped per the standard definition
    val withZero = w(plain ++ Seq(("a", 0L)))
    assert(withZero("a") == ((5L, 18L, 0.40452)), withZero.toString)
    // groups isolated; partitioning invisible
    val both = w(plain ++ tied, parts = 7)
    assert(both("a") == ((5L, 18L, 0.40452)) &&
      both("t") == ((4L, 14L, 0.755929)), both.toString)
  }

  test("kendall tau-b: hand values incl. the tie correction; invariance") {
    def tau(rows: Seq[(String, Long, Long)], parts: Int = 1)
        : Map[String, (Long, Long, Option[Double])] = {
      val df0 = rows.toDF("g", "x", "y")
      val df = if (parts > 1) df0.repartition(parts) else df0
      RankCorr.kendallTauB(df, "g", "x", "y")
        .as[(String, Long, Long, Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    }
    // perfect concordance / discordance
    val up = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L))
    assert(tau(up)("a") == ((3L, 6L, Some(1.0))), tau(up).toString)
    val down = Seq(("d", 1L, 3L), ("d", 2L, 2L), ("d", 3L, 1L))
    assert(tau(down)("d") == ((3L, -6L, Some(-1.0))), tau(down).toString)
    // textbook tie case: x = 1,2,2,3 / y = 1,2,3,3 -> C = 4, D = 0,
    // tau-b = 8/sqrt((12-2)(12-2)) = 0.8
    val ties = Seq(("t", 1L, 1L), ("t", 2L, 2L), ("t", 2L, 3L), ("t", 3L, 3L))
    assert(tau(ties)("t") == ((4L, 8L, Some(0.8))), tau(ties).toString)
    // fully tied margin -> null
    val flat = Seq(("f", 1L, 1L), ("f", 1L, 2L))
    assert(tau(flat)("f") == ((2L, 0L, None)), tau(flat).toString)
    // groups isolated; partitioning invisible
    val all = tau(up ++ down ++ ties ++ flat, parts = 7)
    assert(all("a")._3.contains(1.0) && all("d")._3.contains(-1.0) &&
      all("t")._3.contains(0.8) && all("f")._3.isEmpty, all.toString)
  }

  test("contract queries q148_wilcoxon / q149_kendall run with sane bounds") {
    val sfDir = "/root/testdata/sf0.001"
    val w = SparkEntry.queries("q148_wilcoxon")(spark, sfDir)
      .as[(Int, Long, Long, Double)].collect()
    assert(w.nonEmpty)
    w.foreach { case (_, n, w2, _) =>
      assert(n >= 1 && w2 >= 0 && w2 <= n * (n + 1)) }
    val k = SparkEntry.queries("q149_kendall")(spark, sfDir)
      .as[(String, Long, Long, Option[Double])].collect()
    assert(k.nonEmpty)
    k.foreach { case (_, n, _, t) =>
      assert(n >= 1); t.foreach(v => assert(v >= -1.0 && v <= 1.0)) }
  }

  test("contract query q137_spearman runs per nation with sane bounds") {
    val df = SparkEntry.queries("q137_spearman")(spark, "/root/testdata/sf0.001")
      .as[(Int, Long, Option[Double])].collect()
    assert(df.nonEmpty)
    df.foreach { case (_, n, r) =>
      assert(n >= 1)
      r.foreach(v => assert(v >= -1.0 && v <= 1.0))
    }
  }
}

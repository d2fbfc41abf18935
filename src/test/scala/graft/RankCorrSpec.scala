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

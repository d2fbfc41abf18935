package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Survival

/** Kaplan–Meier + log-rank ([[graft.operators.Survival]]): hand
  * values with censoring, tie handling, the exact ppm log-rank
  * algebra, refusals, partitioning invariance.
  */
class SurvivalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def km(rows: Seq[(String, Long, Int)], parts: Int = 1)
      : Seq[(String, Long, Long, Long, Double)] = {
    val df0 = rows.toDF("g", "t", "e")
    val df = if (parts > 1) df0.repartition(parts) else df0
    Survival.kaplanMeier(df, "g", "t", "e")
      .orderBy("g", "t")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
  }

  test("kaplan-meier: censoring shrinks the risk set without a step") {
    // events at 1, 3, 4; censored at 2: S = 3/4, then x 1/2, then 0
    val got = km(Seq(("a", 1L, 1), ("a", 2L, 0), ("a", 3L, 1), ("a", 4L, 1)))
    assert(got == Seq(("a", 1L, 4L, 1L, 0.75),
      ("a", 3L, 2L, 1L, 0.375), ("a", 4L, 1L, 1L, 0.0)), got.toString)
  }

  test("kaplan-meier: tied events and same-time censoring") {
    // two events + one censor all at t=1 (censored stays at risk
    // THROUGH t), one event at 2
    val got = km(Seq(("b", 1L, 1), ("b", 1L, 1), ("b", 1L, 0), ("b", 2L, 1)))
    assert(got == Seq(("b", 1L, 4L, 2L, 0.5), ("b", 2L, 1L, 1L, 0.0)),
      got.toString)
  }

  test("kaplan-meier: groups are isolated; partitioning is invisible") {
    val rows = Seq(("a", 1L, 1), ("a", 2L, 0), ("a", 3L, 1), ("a", 4L, 1),
      ("b", 1L, 1), ("b", 1L, 1), ("b", 1L, 0), ("b", 2L, 1))
    assert(km(scala.util.Random.shuffle(rows), parts = 7) == km(rows))
  }

  test("kaplan-meier: table-size refusal names the knob") {
    val rows = (1L to 10L).map(t => ("a", t, 1))
    val e = intercept[IllegalArgumentException] {
      Survival.kaplanMeier(rows.toDF("g", "t", "e"), "g", "t", "e",
        maxTableRows = 5).collect()
    }
    assert(e.getMessage.contains("maxTableRows"))
  }

  test("log-rank: hand values in the exact ppm algebra") {
    // A events at 1, 2; B events at 3, 4 (A dies first — O > E)
    // t=1: e = 2*1e6/4 = 500000, v = 1*2*2*3*1e6/(16*3) = 250000
    // t=2: e = 1*1e6/3 = 333333, v = 1*1*2*2*1e6/(9*2) = 222222
    // t=3,4: n_a = 0 -> e = v = 0
    val rows = Seq(("A", 1L, 1), ("A", 2L, 1), ("B", 3L, 1), ("B", 4L, 1))
    val got = Survival.logRank(rows.toDF("g", "t", "e"), "g", "t", "e", "A")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert((got._1, got._2, got._3) == ((2L, 833333L, 472222L)), got.toString)
    val z = (2.0 - 833333.0 / 1e6) / math.sqrt(472222.0 / 1e6)
    assert(math.abs(got._4.get - z) < 1e-5, s"${got._4} vs $z")
    // identical groups: O == E up to the ppm floor, z ~ 0
    val same = Seq(("A", 1L, 1), ("A", 2L, 1), ("B", 1L, 1), ("B", 2L, 1))
    val g2 = Survival.logRank(same.toDF("g", "t", "e"), "g", "t", "e", "A")
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(g2._1 == 2L && math.abs(g2._2 - 2000000L) <= 2, g2.toString)
    assert(math.abs(g2._4.get) < 1e-3, g2.toString)
  }

  test("log-rank: censored-only group keeps its risk set; refusals") {
    // B never events but stays at risk — E_A must account for it
    val rows = Seq(("A", 1L, 1), ("A", 2L, 1), ("B", 5L, 0), ("B", 5L, 0))
    val got = Survival.logRank(rows.toDF("g", "t", "e"), "g", "t", "e", "A")
      .as[(Long, Long, Long, Option[Double])].collect().head
    // t=1: e = 2*1*1e6/4 = 500000; t=2: e = 1*1*1e6/3 = 333333
    assert((got._1, got._2) == ((2L, 833333L)), got.toString)
    // wrong group count refuses
    val e1 = intercept[IllegalArgumentException] {
      Survival.logRank(Seq(("A", 1L, 1)).toDF("g", "t", "e"),
        "g", "t", "e", "A").collect()
    }
    assert(e1.getMessage.contains("two groups"))
    val e2 = intercept[IllegalArgumentException] {
      Survival.logRank(
        Seq(("A", 1L, 1), ("B", 1L, 1), ("C", 1L, 1)).toDF("g", "t", "e"),
        "g", "t", "e", "A").collect()
    }
    assert(e2.getMessage.contains("two groups"))
  }

  test("contract queries q151/q152 run with sane bounds") {
    val sfDir = "/root/testdata/sf0.001"
    val kmRows = SparkEntry.queries("q151_kaplan_meier")(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(kmRows.nonEmpty)
    // survival is monotone nonincreasing within each segment
    kmRows.groupBy(_._1).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._2).map(_._5)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => b <= a + 1e-12 })
      rs.foreach { r => assert(r._3 >= r._4 && r._5 >= 0.0 && r._5 <= 1.0) }
    }
    val lr = SparkEntry.queries("q152_log_rank")(spark, sfDir)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(lr.length == 1 && lr.head._1 >= 0 && lr.head._3 >= 0)
  }
}

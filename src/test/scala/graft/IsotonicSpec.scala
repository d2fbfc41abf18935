package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Isotonic

/** PAV isotonic calibration ([[graft.operators.Isotonic]]): hand
  * pooling cases, strict monotonicity of the canonical blocks, the
  * cap refusal, partitioning invariance.
  */
class IsotonicSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fit(rows: Seq[(Long, Int)], parts: Int = 1)
      : Seq[(Long, Long, Long, Long, Double)] = {
    val df0 = rows.toDF("s", "y")
    val df = if (parts > 1) df0.repartition(parts) else df0
    Isotonic.calibrate(df, "s", "y")
      .orderBy("score_lo")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
  }

  test("violators pool; the pooled block can cascade into earlier ones") {
    // rates by score: 1 -> 1/2, 2 -> 0/2, 3 -> 1/1, 4 -> 1/2:
    // (1,2) pool to 1/4; (3,4) pool to 2/3 — two monotone blocks
    val rows = Seq((1L, 1), (1L, 0), (2L, 0), (2L, 0),
      (3L, 1), (4L, 1), (4L, 0))
    assert(fit(rows) == Seq((1L, 2L, 4L, 1L, 0.25),
      (3L, 4L, 3L, 2L, 0.666666667)), fit(rows).toString)
  }

  test("already-monotone data keeps one block per score") {
    val rows = Seq((1L, 0), (2L, 1), (2L, 0), (3L, 1))
    assert(fit(rows) == Seq((1L, 1L, 1L, 0L, 0.0),
      (2L, 2L, 2L, 1L, 0.5), (3L, 3L, 1L, 1L, 1.0)))
  }

  test("equal-rate neighbors merge into the canonical minimal step function") {
    val rows = Seq((1L, 1), (1L, 0), (2L, 1), (2L, 0))
    assert(fit(rows) == Seq((1L, 2L, 4L, 2L, 0.5)))
  }

  test("global anti-monotone data collapses to one block = the base rate") {
    val rows = Seq((1L, 1), (2L, 1), (2L, 0), (3L, 0))
    assert(fit(rows) == Seq((1L, 3L, 4L, 2L, 0.5)))
  }

  test("rates strictly increase across blocks; partitioning invisible") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(_ =>
      (rnd.nextInt(40).toLong, if (rnd.nextBoolean()) 1 else 0))
    val blocks = fit(rows)
    blocks.zip(blocks.tail).foreach { case (a, b) =>
      assert(a._5 < b._5, s"non-increasing blocks: $a -> $b")
      assert(a._2 < b._1, "blocks must not overlap")
    }
    assert(blocks.map(_._3).sum == 500L)
    assert(fit(scala.util.Random.shuffle(rows), parts = 7) == blocks)
  }

  test("cardinality refusal names the knob") {
    val rows = Seq((1L, 1), (2L, 0), (3L, 1))
    val e = intercept[IllegalArgumentException] {
      Isotonic.calibrate(rows.toDF("s", "y"), "s", "y",
        maxScoreValues = 2).collect()
    }
    assert(e.getMessage.contains("maxScoreValues"))
  }

  test("contract query q153_isotonic: monotone blocks over quantity") {
    val got = SparkEntry.queries("q153_isotonic")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty && got.map(_._3).sum > 0)
    got.zip(got.tail).foreach { case (a, b) => assert(a._5 < b._5) }
  }
}

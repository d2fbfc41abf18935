package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpatialJoin

/** Grid-bucketed radius self-join: exact parity with the quadratic
  * brute force, boundary inclusion, dedup, and the hot-cell refusal.
  */
class SpatialJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)], r: Long) =
    (for {
      a <- pts; b <- pts
      if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1, d2)).toSet

  test("parity with quadratic brute force on random points") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 500L).map(i =>
      (i, rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong))
    for (r <- Seq(1L, 50L, 300L)) {
      val got = SpatialJoin
        .radiusSelfJoin(pts.toDF("id", "x", "y"), "id", "x", "y", r)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === brute(pts, r), s"r=$r")
      assert(got.nonEmpty || r == 1L)
    }
  }

  test("pairs exactly at distance r are included; r+1 excluded") {
    // (0,0)-(3,4) is distance exactly 5; (0,0)-(0,6) is 6
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 0L, 6L))
    val got = SpatialJoin
      .radiusSelfJoin(pts.toDF("id", "x", "y"), "id", "x", "y", r = 5L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 25L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L))
    // cross-cell boundary: cell side 5, points straddling the wall
    val wall = Seq((1L, 4L, 0L), (2L, 5L, 0L), (3L, 14L, 0L))
    val got2 = SpatialJoin
      .radiusSelfJoin(wall.toDF("id", "x", "y"), "id", "x", "y", r = 5L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 === Set((1L, 2L, 1L)))
  }

  test("hot cell refuses with the knob's name; negatives refused") {
    val hot = (1L to 50L).map(i => (i, 3L, 3L)) // all in one cell
    val e = intercept[IllegalArgumentException] {
      SpatialJoin.radiusSelfJoin(hot.toDF("id", "x", "y"),
        "id", "x", "y", r = 10L, maxCellSize = 10L).count()
    }
    assert(e.getMessage.contains("maxCellSize"))
    val neg = Seq((1L, -3L, 0L), (2L, 3L, 0L))
    val e2 = intercept[IllegalArgumentException] {
      SpatialJoin.radiusSelfJoin(neg.toDF("id", "x", "y"),
        "id", "x", "y", r = 10L).count()
    }
    assert(e2.getMessage.contains("non-negative"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Common-neighbor link prediction ([[GraphOps.commonNeighborLinks]]):
  * hand-graph values, existing-edge exclusion, the exact Jaccard ppm,
  * deterministic top-k order, partitioning invariance.
  */
class LinkPredictionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def links(edges: Seq[(Long, Long)], k: Int = 20, parts: Int = 1)
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    val df0 = edges.toDF("a", "b")
    val df = if (parts > 1) df0.repartition(parts) else df0
    GraphOps.commonNeighborLinks(df, "a", "b", k)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
  }

  test("path 1-2-3: the single wedge candidate with full Jaccard") {
    // N(1) = {2} and N(3) = {2}: union = intersection = {2}
    assert(links(Seq((1L, 2L), (2L, 3L))) ==
      Seq((1L, 3L, 1L, 1000000L, 1L, 1L)))
  }

  test("square: both diagonals, two common neighbors each") {
    val got = links(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(got == Seq((1L, 3L, 2L, 1000000L, 2L, 2L),
      (2L, 4L, 2L, 1000000L, 2L, 2L)), got.toString)
  }

  test("existing edges are never candidates: a triangle predicts nothing") {
    assert(links(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isEmpty)
  }

  test("jaccard ppm is the exact integer share; ordering is (common, ppm, x, y)") {
    // star 1-{2,3,4} plus edge 2-5: candidates (2,3),(2,4),(3,4) via
    // center 1 and (1,5) via center 2
    val got = links(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L)))
    // (3,4): deg 1,1 -> union 1, ppm 1000000; (2,3)/(2,4): deg 2,1 ->
    // union 2, ppm 500000; (1,5): deg 3,1 -> union 3, ppm 333333
    assert(got == Seq(
      (3L, 4L, 1L, 1000000L, 1L, 1L),
      (2L, 3L, 1L, 500000L, 2L, 1L),
      (2L, 4L, 1L, 500000L, 2L, 1L),
      (1L, 5L, 1L, 333333L, 3L, 1L)), got.toString)
    // k truncates deterministically
    assert(links(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L)), k = 2) ==
      got.take(2))
  }

  test("duplicate/reversed/self edges canonicalized; partitioning invisible") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 2L))
    assert(links(messy) == Seq((1L, 3L, 1L, 1000000L, 1L, 1L)))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(links(scala.util.Random.shuffle(square), parts = 7) ==
      links(square))
  }

  test("maxDegree hub cap: the hub is skipped as a wedge center, " +
      "sub-cap candidates stay exact with TRUE degrees, report quantifies") {
    // hub 100 — {1..10} (degree 10), plus chain 1-2-3: the only
    // sub-cap candidate is (1,3) via center 2 (pairs through the hub
    // center would be 45 wedges)
    val edges = ((1L to 10L).map(i => (100L, i)) ++
      Seq((1L, 2L), (2L, 3L))).toDF("a", "b")
    val (capped, report) = GraphOps.commonNeighborLinksWithReport(
      edges, "a", "b", k = 50, maxDegree = 5L)
    // deg(1) = {100, 2} = 2, deg(3) = {100, 2} = 2, union = 3
    assert(capped.as[(Long, Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq((1L, 3L, 1L, 333333L, 2L, 2L)))
    assert(report.as[(Long, Long, Long)].collect().toSeq ==
      Seq((1L, 10L, 45L)))
    // uncapped: the hub center contributes its C(10,2) pairs too
    val (uncapped, report2) = GraphOps.commonNeighborLinksWithReport(
      edges, "a", "b", k = 50, maxDegree = 100L)
    assert(uncapped.count() > 40)
    assert(report2.as[(Long, Long, Long)].collect().toSeq ==
      Seq((0L, 10L, 0L)))
  }

  test("empty edge input: the one-row report is TOTAL (zeros, not nulls)") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val (links0, report) = GraphOps.commonNeighborLinksWithReport(
      empty, "a", "b", k = 5)
    assert(links0.isEmpty)
    // a bigint-reading consumer must not NPE on the report fields
    assert(report.as[(Long, Long, Long)].collect().toSeq ==
      Seq((0L, 0L, 0L)))
    // the plain path (which now reads the report eagerly to warn on
    // skips) must also survive an empty graph
    assert(GraphOps.commonNeighborLinks(empty, "a", "b", k = 5).isEmpty)
  }

  test("contract query q150_link_prediction: top-20, deterministic, candidates only") {
    val sfDir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("q150_link_prediction")(spark, sfDir).collect()
    val b = SparkEntry.queries("q150_link_prediction")(spark, sfDir).collect()
    assert(a.nonEmpty && a.length <= 20)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    a.foreach { r =>
      assert(r.getLong(2) >= 1L)                       // common >= 1
      assert(r.getLong(3) >= 1L && r.getLong(3) <= 1000000L)
    }
  }
}

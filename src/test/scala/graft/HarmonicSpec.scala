package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Harmonic centrality ([[GraphOps.harmonicCentrality]]): exact ppm
  * hand values on path/star graphs, disconnection handling,
  * symmetrization, refusals, partitioning invariance.
  */
class HarmonicSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], parts: Int = 1)
      : Map[Long, (Long, Long)] = {
    val df = edges.toDF("x", "y").repartition(parts)
    GraphOps.harmonicCentrality(df, "x", "y").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("path 1-2-3-4: exact floored ppm reciprocal sums") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    // end: 1 + 1/2 + 1/3 → 10⁶ + 5·10⁵ + ⌊10⁶/3⌋
    assert(got(1L) == ((3L, 1833333L)), got.toString)
    assert(got(4L) == ((3L, 1833333L)))
    // middle: 1 + 1 + 1/2
    assert(got(2L) == ((3L, 2500000L)))
    assert(got(3L) == ((3L, 2500000L)))
  }

  test("star: center beats every leaf") {
    val got = run(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)))
    assert(got(10L) == ((4L, 4000000L)))
    // leaf: 1 + 3·(1/2)
    assert(got(1L) == ((4L, 2500000L)))
  }

  test("disconnected components: unreachable nodes contribute zero, not infinity") {
    val got = run(Seq((1L, 2L), (3L, 4L)))
    assert(got(1L) == ((1L, 1000000L)) && got(3L) == ((1L, 1000000L)))
  }

  test("directed input is symmetrized (centrality is an undirected notion here)") {
    val got = run(Seq((1L, 2L)))
    assert(got(1L) == ((1L, 1000000L)) && got(2L) == ((1L, 1000000L)))
  }

  test("refusals: node cap and BFS truncation") {
    val e = intercept[IllegalArgumentException] {
      GraphOps.harmonicCentrality(
        Seq((1L, 2L), (2L, 3L)).toDF("x", "y"), "x", "y", maxNodes = 2L)
    }
    assert(e.getMessage.contains("maxNodes"))
    val t = intercept[IllegalArgumentException] {
      GraphOps.harmonicCentrality(
        Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y"), "x", "y",
        maxHops = 1)
    }
    assert(t.getMessage.contains("maxHops"))
  }

  test("partitioning invariance") {
    val edges = (1L to 40L).map(i => (i, i * 7 % 41 + 1))
      .filter { case (a, b) => a != b }
    assert(run(edges, 1) == run(edges, 11))
  }
}

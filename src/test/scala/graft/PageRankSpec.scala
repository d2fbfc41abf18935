package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** Reference implementation of the SAME integer fixed-point
    * recurrence, dense, single-threaded — the operator must match it
    * EXACTLY (integer arithmetic leaves no tolerance to hide in).
    */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long = 1000000000000L): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * 3 / (20 * n)
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outdeg.contains).map(r).sum
      val dShare = dangling / n
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outdeg(s) }.sum).toMap
      r = nodes.map(v =>
        v -> (base + 17 * (inflow.getOrElse(v, 0L) + dShare) / 20)).toMap
    }
    r
  }

  test("pagerank matches the dense integer reference EXACTLY on a cyclic graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    val got = PageRank.run(edges.toDF("s", "t"), "s", "t", iters = 12)
      .as[(Long, Long)].collect().toMap
    assert(got == reference(edges, 12))
    // C collects from everyone -> highest authority; dangling-free
    // cycle keeps A above the leaf D
    assert(got(3L) > got(1L) && got(1L) > got(4L))
  }

  test("pagerank: star hub dominates; dangling hub recycles mass; total mass conserved to floor noise") {
    val spokes = (2L to 21L)
    val edges = spokes.map(s => (s, 1L)) // 20 spokes -> hub, hub dangles
    val got = PageRank.run(edges.toDF("s", "t"), "s", "t", iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == reference(edges, 10))
    assert(got(1L) > got(2L) * 5, s"hub ${got(1L)} vs spoke ${got(2L)}")
    val total = got.values.sum
    val scale = 1000000000000L
    // floor losses: <= ~(N + 2) microunits per iteration
    assert(scale - total >= 0 && scale - total < 10L * (spokes.size + 3) * 2,
      s"mass $total vs $scale")
  }

  test("pagerank early-stops on convergence and matches the reference at that depth") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L))
    // movement decays by the damping factor per pass (~0.85^k), so a
    // 1e9-microunit tolerance is reached around k≈35 — well inside
    // the 200-pass budget the early stop must save
    val tol = 1000000000L
    val got = PageRank.run(edges.toDF("s", "t"), "s", "t",
        iters = 200, tolMicro = tol)
      .as[(Long, Long)].collect().toMap
    val depths = (1 to 100).map(k => k -> reference(edges, k)).toMap
    val hit = depths.find { case (k, r) =>
      r == got && k < 100 &&
        depths.get(k - 1).forall(prev =>
          prev.keys.forall(n => math.abs(prev(n) - r(n)) <= tol))
    }
    assert(hit.isDefined, s"no early-stop depth reproduces $got")
  }

  test("pagerank is BIT-identical under adversarial repartitioning") {
    val edges = (1L to 300L).flatMap(i =>
      Seq((i, i * 7 % 300 + 1), (i, i * 13 % 300 + 1)))
    val df = edges.toDF("s", "t")
    val a = PageRank.run(df, "s", "t", iters = 8)
      .as[(Long, Long)].collect().toSet
    val b = PageRank.run(df.repartition(23), "s", "t", iters = 8)
      .as[(Long, Long)].collect().toSet
    assert(a == b)
    assert(a == reference(edges, 8).toSet)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Personalized PageRank ([[PageRank.personalized]]): exact-integer
  * hand values, the all-seeds == global identity, seed refusals,
  * partitioning invariance.
  */
class PprSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ppr(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  iters: Int, parts: Int = 1): Map[Long, Long] = {
    val df0 = edges.toDF("s", "d")
    val df = if (parts > 1) df0.repartition(parts) else df0
    PageRank.personalized(df, "s", "d", seeds.toDF("n"), "n", iters = iters)
      .as[(Long, Long)].collect().toMap
  }

  test("path 1->2->3 seeded at 1: exact integer microunit values") {
    // scale 1e12, damping 17/20, base_seed = 1.5e11; two iterations:
    // r1 = 0.15, r2 = 17*0.15/20 = 0.1275, r3 = 17*0.85/20 = 0.7225
    val got = ppr(Seq((1L, 2L), (2L, 3L)), Seq(1L), iters = 2)
    assert(got == Map(1L -> 150000000000L, 2L -> 127500000000L,
      3L -> 722500000000L), got.toString)
  }

  test("restart localizes mass: near-seed nodes outrank far ones") {
    // two disjoint chains; seeding chain A leaves chain B at 0
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))
    val got = ppr(edges, Seq(1L), iters = 6)
    assert(got(2L) > 0 && got(3L) > 0)
    assert(got(10L) == 0 && got(11L) == 0 && got(12L) == 0, got.toString)
  }

  test("seeding every node reproduces global PageRank bit-for-bit") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val all = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val got = ppr(edges, all, iters = 5)
    val global = PageRank.run(edges.toDF("s", "d"), "s", "d", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == global, s"$got vs $global")
  }

  test("seeds outside the graph refuse; empty seed set refuses") {
    val edges = Seq((1L, 2L))
    val e1 = intercept[IllegalArgumentException](
      ppr(edges, Seq(99L), iters = 1))
    assert(e1.getMessage.contains("seeds missing"))
    val e2 = intercept[IllegalArgumentException](
      ppr(edges, Seq.empty[Long], iters = 1))
    assert(e2.getMessage.contains("seed"))
  }

  test("partitioning is invisible (exact integers)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L),
      (5L, 2L))
    assert(ppr(scala.util.Random.shuffle(edges), Seq(1L, 5L),
      iters = 6, parts = 7) == ppr(edges, Seq(1L, 5L), iters = 6))
  }

  test("contract query graph_ppr: deterministic top-20, positive ranks") {
    val sfDir = "/root/testdata/sf0.001"
    val a = SparkEntry.queries("graph_ppr")(spark, sfDir).collect()
    val b = SparkEntry.queries("graph_ppr")(spark, sfDir).collect()
    assert(a.nonEmpty && a.length <= 20)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    a.foreach(r => assert(r.getLong(1) > 0L))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Per-node local clustering coefficient: hand-computed values, the
  * Σ n_tri = 3·triangles identity, and partitioning invariance.
  */
class LocalClusteringSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed: K4 plus a pendant node") {
    // K4 on 1..4 (every node lcc=1, 3 triangles each... per node:
    // deg 3, neighbour pairs 3, all connected → lcc 1) plus node 5
    // hanging off node 1 (deg(1) becomes 4, its 6 neighbour pairs
    // include 3 with node 5 that are not edges → lcc(1)=3/6=0.5;
    // lcc(5)=0 by the degree-1 convention).
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    val got = GraphOps.localClustering(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set(
      (1L, 4L, 3L, 0.5), (2L, 3L, 3L, 1.0), (3L, 3L, 3L, 1.0),
      (4L, 3L, 3L, 1.0), (5L, 1L, 0L, 0.0)))
  }

  test("per-node triangle counts sum to 3x the global count") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 600).map(_ =>
      (rnd.nextInt(40).toLong + 1, rnd.nextInt(40).toLong + 1))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("a", "b")
    val perNode = GraphOps.localClustering(df, "a", "b")
      .agg(org.apache.spark.sql.functions.sum("n_tri")).as[Long].collect()(0)
    val global = GraphOps.triangleCount(df, "a", "b")
      .select("n_triangles").as[Long].collect()(0)
    assert(global > 0)
    assert(perNode === 3 * global)
  }

  test("result is partitioning-invariant") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(30).toLong + 1, rnd.nextInt(30).toLong + 1))
      .filter(e => e._1 != e._2)
    val one = GraphOps.localClustering(
      edges.toDF("a", "b").repartition(1), "a", "b")
      .as[(Long, Long, Long, Double)].collect().toSet
    val many = GraphOps.localClustering(
      edges.toDF("a", "b").repartition(17), "a", "b")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(one === many)
  }
}

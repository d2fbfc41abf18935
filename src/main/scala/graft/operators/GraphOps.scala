package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected simple graph — the
  * clustering-coefficient / community-density primitive next to
  * [[Components]] / [[PageRank]] / [[Bfs]].
  *
  * Degree-ordered edge orientation (the classic Schank–Wagner /
  * Cohen MapReduce formulation): every edge is directed from its
  * smaller (degree, id) endpoint to the larger, which bounds
  * out-degrees at O(√|E|) — so the wedge join costs Σ outdeg², never
  * the hub-quadratic Σ deg² a naive wedge join pays on skewed graphs
  * (a star graph generates ZERO wedges here: the hub is the largest
  * endpoint of every edge). Each triangle is counted exactly once, at
  * its order-minimal vertex; the closing edge is confirmed by one
  * left-semi join. Exact integers throughout — bit-deterministic
  * under any partitioning.
  */
object GraphOps {

  /** Count triangles in the undirected graph given as an edge list
    * (each undirected edge once, either direction; self-loops and
    * duplicate edges are removed first).
    *
    * @return one row: (n_nodes, n_edges, n_triangles), all bigint
    */
  def triangleCount(edgesIn: DataFrame, aCol: String, bCol: String)
  : DataFrame = {
    // canonicalize: a < b, dedup, no self-loops
    val edges = edgesIn
      .select(least(col(aCol), col(bCol)).as("x"),
        greatest(col(aCol), col(bCol)).as("y"))
      .filter(col("x") =!= col("y"))
      .distinct()
      .localCheckpoint(true) // degrees + orientation + closing join
    val deg = edges.select(col("x").as("node"))
      .unionAll(edges.select(col("y").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), "x")
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), "y")
    val oriented = withDeg.select(
        when(struct(col("dx"), col("x")) < struct(col("dy"), col("y")),
          struct(col("x").as("u"), col("dx").as("du"),
            col("y").as("v"), col("dy").as("dv")))
          .otherwise(struct(col("y").as("u"), col("dy").as("du"),
            col("x").as("v"), col("dx").as("dv"))).as("e"))
      .select(col("e.u"), col("e.du"), col("e.v"), col("e.dv"))
      .localCheckpoint(true) // wedge sides + closing probe
    val wedges = oriented.select(col("u"), col("v").as("w1"), col("dv").as("dw1"))
      .join(oriented.select(col("u"), col("v").as("w2"), col("dv").as("dw2")), "u")
      .filter(struct(col("dw1"), col("w1")) < struct(col("dw2"), col("w2")))
    val tri = wedges.join(oriented.select(col("u").as("w1"), col("v").as("w2")),
      Seq("w1", "w2"), "left_semi")
    val nNodes = deg.agg(count(lit(1)).cast("bigint").as("n_nodes"))
    val nEdges = edges.agg(count(lit(1)).cast("bigint").as("n_edges"))
    val nTri = tri.agg(count(lit(1)).cast("bigint").as("n_triangles"))
    nNodes.crossJoin(broadcast(nEdges)).crossJoin(broadcast(nTri))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search: minimum hop distance from a
  * seed set to every reachable node, the level-synchronous frontier
  * algorithm every distributed graph engine uses (Pregel's BFS
  * example; same iteration discipline as [[Components]] and
  * [[PageRank]]).
  *
  * Each round joins the current frontier with the edge list (one |E|
  * shuffle on the join key), anti-joins out already-visited nodes,
  * and marks the remainder with the next distance. Distances are
  * exact integers, so results are bit-deterministic regardless of
  * partitioning.
  *
  * Scale shape: per-iteration state (`visited`, `frontier`) is
  * materialized with an EAGER `localCheckpoint` — the lesson measured
  * on PageRank and Components: `cache` cuts execution lineage but the
  * LOGICAL plan keeps growing, and Catalyst planning cost compounds
  * per iteration until planning dwarfs execution. Iterations stop at
  * `maxHops` (bounded state) or when a frontier empties, whichever
  * comes first; the frontier emptiness probe rides the checkpointed
  * frontier, not a recomputation.
  */
object Bfs {

  /** `edges` (srcCol, dstCol) is followed as directed — symmetrize
    * before the call for undirected reach. Returns (node, dist) with
    * dist = min hops from any seed (seeds themselves at 0).
    */
  def multiSourceBfs(edges: DataFrame, srcCol: String, dstCol: String,
                     seeds: DataFrame, seedCol: String,
                     maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    var visited = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var frontier = visited.select("node").localCheckpoint(true)
    var hop = 1L
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(e, frontier("node") === e("__src"))
        .select(col("__dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(true)
      visited = visited
        .unionByName(next.withColumn("dist", lit(hop)))
        .localCheckpoint(true)
      frontier = next
      hop += 1
    }
    visited
  }

  /** PER-SOURCE multi-source BFS — the landmark/all-pairs form: one
    * level-synchronous sweep over the COMPOSITE (source, node)
    * frontier computes d(s, v) for every seed s SIMULTANEOUSLY (the
    * state is |seeds|·|reach| pairs — size the seed set accordingly;
    * [[GraphOps.harmonicCentrality]] caps it). Same iteration
    * discipline as [[multiSourceBfs]]; exact integer distances,
    * bit-deterministic.
    *
    * REFUSES if any frontier is still live at `maxHops` — a
    * truncated distance table silently isn't the distance table (the
    * graph-loop refusal convention).
    *
    * @return (src, node, dist) for every seed × reachable node,
    *         seeds themselves at dist 0
    */
  def perSourceBfs(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, seedCol: String,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    var visited = seeds.select(col(seedCol).as("src")).distinct()
      .select(col("src"), col("src").as("node"))
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var frontier = visited.select("src", "node").localCheckpoint(true)
    var hop = 1L
    while (hop <= maxHops && !frontier.isEmpty) {
      val next = frontier.join(e, frontier("node") === e("__src"))
        .select(col("src"), col("__dst").as("node")).distinct()
        .join(visited.select("src", "node"), Seq("src", "node"),
          "left_anti")
        .localCheckpoint(true)
      visited = visited
        .unionByName(next.withColumn("dist", lit(hop)))
        .localCheckpoint(true)
      frontier = next
      hop += 1
    }
    require(frontier.isEmpty,
      s"perSourceBfs: frontier still live after maxHops=$maxHops — a " +
        "truncated distance table is not the distance table; raise " +
        "maxHops (the graph diameter bounds it)")
    visited
  }
}

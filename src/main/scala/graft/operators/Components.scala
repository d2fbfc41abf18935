package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the
  * clustering step after pair generation: every document in a
  * component shares its representative (the minimum id), so "keep one
  * per component" drops all transitive duplicates.
  *
  * Distributed min-label propagation: each iteration is one
  * join+aggregate on the edge list; labels converge in O(diameter)
  * iterations (near-dup graphs are overwhelmingly tiny cliques, so
  * 2-3 in practice). Each iteration's result is cached and the
  * previous lineage dropped, so the plan does not grow with the
  * iteration count — the standard shape for iterative DataFrame
  * algorithms.
  */
object Components {

  /** @param pairs two-column DataFrame of undirected edges
    * @return (id, component) with component = min id reachable
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).cache()
    labels.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prop = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("component")).as("nbr"))
      // carry the previous label through the projection so the
      // convergence check is a filter on the SAME cached result —
      // one join and one action per iteration
      val next = labels.join(prop, Seq("id"), "left")
        .select(col("id"), col("component").as("__old"),
          least(col("component"), coalesce(col("nbr"), col("component"))).as("component"))
        .cache()
      val changed = next.filter(col("component") =!= col("__old")).limit(1).count() > 0
      labels.unpersist()
      labels = next.select("id", "component")
      converged = !changed
      i += 1
    }
    sym.unpersist()
    labels
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic DBSCAN (Ester et al., KDD'96) over integer 2-D
  * points — density clustering for geo dedup, sensor grouping, and
  * embedding-projection cluster audits.
  *
  * Composition of two existing scale-shaped pieces:
  *  - neighborhoods from [[SpatialJoin.radiusSelfJoin]] (grid cells →
  *    3×3 equi-join, hot-cell guard — never N²);
  *  - clusters from [[Components.connectedComponents]] over the
  *    core-core neighbor graph (min-id labels, iteration-bounded).
  *
  * Determinism: the textbook algorithm is scan-order-dependent for
  * border points reachable from several clusters; here a border point
  * joins the MINIMUM cluster label among its core neighbors, making
  * the output canonical. Core counts include the point itself (the
  * standard convention). Output: (id, role ∈ core|border|noise,
  * cluster — null for noise; label = min core id in the cluster).
  */
object Dbscan {

  /** @param partitions parallelism for the components fixpoint and
    *        the pair frames — the [[Components]] convention: when the
    *        POINT SET is model-sized, per-iteration task overhead
    *        dominates the driver-looped label propagation, and a
    *        small explicit count removes most of it; the result is
    *        partition-invariant, only wall clock changes.
    */
  def dbscan(df: DataFrame, idCol: String, xCol: String, yCol: String,
             r: Long, minPts: Int,
             maxCellSize: Long = 100000L, partitions: Int = 0): DataFrame = {
    require(minPts >= 1, s"dbscan: minPts must be >= 1, got $minPts")
    val pts = df.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val pairsBase = SpatialJoin.radiusSelfJoin(pts, "id", "x", "y", r, maxCellSize)
      .select(col("id_a"), col("id_b"))
    val pairs = (if (partitions > 0) pairsBase.repartition(partitions, col("id_a"))
                 else pairsBase).localCheckpoint(true)
    val sym = pairs.unionAll(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    // neighbor count INCLUDING self; points with zero neighbors never
    // appear in sym, hence the left join + coalesce
    val nbrCount = sym.groupBy(col("id_a").as("id"))
      .agg(count(lit(1)).as("nn"))
    val roles = pts.join(nbrCount, Seq("id"), "left")
      .select(col("id"), (coalesce(col("nn"), lit(0L)) + 1).as("n_in_r"))
      .withColumn("is_core", col("n_in_r") >= minPts)
      .localCheckpoint(true)
    val coreIds = roles.filter(col("is_core")).select(col("id"))
    // core-core edges -> components; an isolated core (no core
    // neighbor) is its own cluster, restored by the left join below
    val coreEdges = sym
      .join(coreIds.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(coreIds.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    val comp = Components.connectedComponents(coreEdges, "id_a", "id_b",
      partitions = partitions)
    val coreClusters = coreIds
      .join(comp.withColumnRenamed("id", "id2"), col("id") === col("id2"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
      .localCheckpoint(true)
    // border: non-core with >= 1 core neighbor; min cluster label
    // among core neighbors (canonical tie-break)
    val borderClusters = sym
      .join(roles.filter(!col("is_core")).select(col("id").as("id_a")),
        Seq("id_a"), "left_semi")
      .join(coreClusters.select(col("id").as("id_b"), col("cluster")),
        Seq("id_b"))
      .groupBy(col("id_a").as("id")).agg(min(col("cluster")).as("cluster"))
    val labelled = coreClusters.withColumn("role", lit("core"))
      .unionByName(borderClusters.withColumn("role", lit("border")))
    roles.select(col("id"))
      .join(labelled, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("role"), lit("noise")).as("role"), col("cluster"))
  }
}

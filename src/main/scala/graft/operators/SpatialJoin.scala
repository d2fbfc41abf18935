package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact planar radius self-join via grid bucketing — the spatial
  * analogue of the blocking joins elsewhere in this package (cf.
  * reference src/main/scala TableReader's single-table world: the
  * reference has no spatial surface; this follows the standard
  * grid-file / fixed-grid spatial-hash-join design, e.g. Patel &
  * DeWitt SIGMOD'96 "Partition Based Spatial-Merge Join").
  *
  * Points with integer coordinates (x, y) ≥ 0; find all pairs with
  * squared Euclidean distance ≤ r². Bucket each point into a cell of
  * side r: any qualifying pair lies in the same or an adjacent cell,
  * so candidates are an EQUI-join of points against the 3×3
  * neighbourhood replication of the other side — candidate volume is
  * Σ_cell 9·|cell|·density, never N², and the join shuffles on the
  * cell key like any other equi-join (broadcastable when one side is
  * small, AQE-skew-splittable otherwise). The exact integer
  * dx² + dy² ≤ r² filter runs inside the join's codegen stage; the
  * id< constraint keeps each unordered pair exactly once (each pair
  * appears exactly twice in the candidate stream, once per
  * direction).
  *
  * Skew guard (the q66/maxBlockSize convention): a degenerate cell
  * holding k points contributes k² candidates, so `maxCellSize`
  * REFUSES loudly instead of letting one hot cell quadratically
  * dominate an executor; the check rides a cell-cardinality
  * aggregation that also validates the coordinates are non-negative
  * (floor-vs-truncate division would silently mis-bucket negatives).
  */
object SpatialJoin {

  /** All unordered pairs (id_a < id_b) within squared distance r² —
    * columns (id_a, id_b, d2). Input must be unique on `idCol`.
    */
  def radiusSelfJoin(df: DataFrame, idCol: String, xCol: String,
                     yCol: String, r: Long,
                     maxCellSize: Long = 100000L): DataFrame = {
    require(r > 0, s"radiusSelfJoin: r must be positive, got $r")
    val pts = df.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cx", expr(s"x div $r")).withColumn("cy", expr(s"y div $r"))
    // one model-sized pass: hottest cell + coordinate-domain check
    val guard = pts.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("mx"), min(col("y")).as("my"))
      .agg(max(col("n")).as("hot"), min(col("mx")).as("minx"),
        min(col("my")).as("miny"), count(lit(1)).as("n_cells"))
      .collect()(0)
    if (guard.get(0) != null) {
      require(guard.getLong(1) >= 0 && guard.getLong(2) >= 0,
        "radiusSelfJoin: coordinates must be non-negative (integer div " +
          "truncates toward zero — negative coords would mis-bucket)")
      require(guard.getLong(0) <= maxCellSize,
        s"radiusSelfJoin: hottest cell holds ${guard.getLong(0)} points " +
          s"> maxCellSize=$maxCellSize — one cell would contribute " +
          "O(cell²) candidate pairs; raise maxCellSize only if that " +
          "volume is genuinely intended, or shrink r")
    }
    val d2: Column = {
      val dx = col("a.x") - col("b.x"); val dy = col("a.y") - col("b.y")
      dx * dx + dy * dy
    }
    val nbr = pts
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id"), col("x"), col("y"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    pts.as("a")
      .join(nbr.as("b"), col("a.cx") === col("b.cx") &&
        col("a.cy") === col("b.cy") && col("a.id") < col("b.id"))
      .filter(d2 <= lit(r * r))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), d2.as("d2"))
  }

  /** Grid hotspot detection (a Getis-Ord-style local density scan
    * without the z-normalization — exact integers instead): per
    * occupied cell, its own point count and the 3×3-neighborhood
    * count. The spatial anomaly/hotspot report shape — fraud rings,
    * sensor clusters, geo spikes.
    *
    * Shape at 100 TB: one hash aggregate to cell counts (cell
    * cardinality, map-side combined), then the neighborhood sum as a
    * 9-way EXPLODE of the model-sized cell table joined back on the
    * cell key — never a point-level self-join. Coordinates must be
    * non-negative (the radiusSelfJoin convention: floor-div cell ids
    * stay aligned).
    *
    * @return (cx, cy, n, neighbor_n) for every OCCUPIED cell
    */
  def gridHotspots(df: DataFrame, xCol: String, yCol: String,
                   cellSize: Long): DataFrame = {
    require(cellSize >= 1, s"gridHotspots: cellSize must be >= 1, got $cellSize")
    hotspotsFromCellCounts(cellCounts(df, xCol, yCol, cellSize))
  }

  /** The per-cell point counts feeding [[gridHotspots]] — exposed
    * because the counts are a SUMMABLE monoid, the state a streaming
    * maintainer folds (StreamHotspots).
    */
  def cellCounts(df: DataFrame, xCol: String, yCol: String,
                 cellSize: Long): DataFrame =
    df.select(
        expr(s"CAST($xCol AS BIGINT) DIV $cellSize").as("cx"),
        expr(s"CAST($yCol AS BIGINT) DIV $cellSize").as("cy"))
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).cast("bigint").as("n"))

  /** Neighborhood report over a prepared (cx, cy, n) cell table. */
  def hotspotsFromCellCounts(cellsIn: DataFrame): DataFrame = {
    val cells = cellsIn.localCheckpoint(true)
    val contrib = cells
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select((col("cx") + col("dx")).as("cx"),
        (col("cy") + col("dy")).as("cy"), col("n"))
      .groupBy(col("cx"), col("cy"))
      .agg(sum(col("n")).cast("bigint").as("neighbor_n"))
    cells.join(contrib, Seq("cx", "cy"))
      .select(col("cx"), col("cy"), col("n"), col("neighbor_n"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge table — the link-authority score of
  * web-crawl curation (rank domains/hosts by the link graph, then
  * weight or gate documents by their source's authority — the
  * "quality by provenance" signal published crawl pipelines use
  * alongside content filters).
  *
  * EXACT INTEGER fixed-point semantics: ranks are bigint microunits
  * (`scale` = 10¹² total mass), damping is the rational 17/20, and
  * every step is integer floor arithmetic (`div`). Integer addition
  * is associative — so the result is BIT-DETERMINISTIC across
  * engines, partitionings, and re-runs (the spec asserts exact
  * equality under an adversarial repartition, something float
  * PageRank cannot promise). Floor rounding loses ≤1 microunit per
  * node per step: mass is conserved to ~N·iters parts per 10¹²,
  * which is noise for a relative authority score.
  *
  * Scale shape (the [[Components]] discipline): the driver loops only
  * over ITERATIONS, reading one scalar per pass (the dangling-mass
  * sum — an aggregate over the |nodes|-sized rank state, never over
  * edges; folding it into the update job as a broadcast one-row
  * frame was measured 6× SLOWER, the broadcast-exchange
  * materialization costing far more than the extra small job).
  * Every step is a distributed join/aggregate on the node key; the
  * rank side is small relative to edges, so AQE broadcasts it into
  * the contribution join and the real per-iteration cost is the
  * one |E|-sized shuffle of contributions — O(iters · |E|) total,
  * the canonical power-iteration cost.
  *
  * Each iteration's rank state is materialized with an EAGER
  * `localCheckpoint`, which truncates the logical plan. `persist`
  * alone is NOT enough: caching cuts execution lineage but the
  * LOGICAL plan keeps growing, and Catalyst planning cost explodes
  * super-linearly with chained-join depth (measured here: iterations
  * 1-7 under a second, iteration 12 at 86 s on a FIVE-ROW graph, all
  * of it planning). Checkpoint data is freed by Spark's
  * ContextCleaner once the previous iteration's frame is
  * unreferenced. On a cluster where executor loss must be survivable
  * mid-run, swap for reliable `checkpoint()` with a checkpoint dir.
  */
object PageRank {

  /** @return (node, rank) with rank in exact bigint microunits of
    *         `scale`; nodes = distinct endpoints of `edges`.
    * @param tolMicro early-stop tolerance: when > 0, iteration halts
    *        once no node's rank moved by more than this many
    *        microunits (one extra |nodes|-sized aggregate per pass —
    *        an integer criterion, so the stopping iteration is itself
    *        deterministic). 0 = always run exactly `iters` passes.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int = 10, scale: Long = 1000000000000L,
          tolMicro: Long = 0L): DataFrame = {
    require(iters > 0, "iters must be positive")
    val dampNum = 17L; val dampDen = 20L // damping 0.85 as a rational
    val e = edges.select(col(srcCol).cast("bigint").as("src"),
      col(dstCol).cast("bigint").as("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("bigint").as("deg")).persist()
    val base = scale * (dampDen - dampNum) / (dampDen * n) // driver longs
    // eager localCheckpoint: materialize AND truncate the logical plan
    var ranks = nodes.withColumn("r", lit(scale / n)).localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val withDeg = ranks.join(outdeg, Seq("node"), "left")
      // one driver scalar per pass, over |nodes| checkpointed rows
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("r")), lit(0L))).head().getLong(0)
      val dShare = dangling / n
      val inflow = withDeg.join(e, withDeg("node") === e("src"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      val prev = ranks
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"$dampNum * (coalesce(inflow, CAST(0 AS BIGINT)) + $dShare) div $dampDen")
          ).cast("bigint").as("r"))
        .localCheckpoint(true)
      if (tolMicro > 0) {
        val moved = ranks.join(
            prev.select(col("node"), col("r").as("r0")), Seq("node"))
          .agg(max(abs(col("r") - col("r0")))).head().getLong(0)
        converged = moved <= tolMicro
      }
      i += 1
    }
    e.unpersist(); outdeg.unpersist(); nodes.unpersist()
    ranks.select(col("node"), col("r").as("rank"))
  }

  /** PERSONALIZED PageRank — random walk with restart at a SEED set
    * (the related-items / recommendation primitive: authority
    * RELATIVE to the seeds, where [[run]] is global): the restart
    * mass (1 − d) and the dangling teleport both go to the seeds
    * (uniformly) instead of all nodes. Same exact-integer fixed-point
    * semantics — bigint microunits, rational 17/20 damping, floor
    * `div`, bit-deterministic under any partitioning — and the same
    * per-iteration lineage truncation. Seeds missing from the graph
    * REFUSE (silently dropping one would redistribute the restart
    * mass and change every score).
    *
    * @param seeds one column of seed node ids (deduplicated here)
    * @return (node, rank) in microunits of `scale`
    */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, seedCol: String,
                   iters: Int = 10, scale: Long = 1000000000000L,
                   tolMicro: Long = 0L): DataFrame = {
    require(iters > 0, "iters must be positive")
    val dampNum = 17L; val dampDen = 20L
    val e = edges.select(col(srcCol).cast("bigint").as("src"),
      col(dstCol).cast("bigint").as("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val sd = seeds.select(col(seedCol).cast("bigint").as("node"))
      .distinct().persist()
    val missing = sd.join(nodes, Seq("node"), "left_anti")
    require(missing.isEmpty,
      "personalized PageRank: seeds missing from the graph — a silent " +
        "drop would redistribute the restart mass " +
        s"(first few: ${missing.limit(3).collect().mkString(", ")})")
    val nS = sd.count()
    require(nS > 0, "personalized PageRank: empty seed set")
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("bigint").as("deg")).persist()
    val baseSeed = scale * (dampDen - dampNum) / (dampDen * nS)
    val seedMark = sd.withColumn("__seed", lit(1))
    // init = the restart distribution itself
    var ranks = nodes.join(seedMark, Seq("node"), "left")
      .select(col("node"),
        when(col("__seed").isNotNull, lit(scale / nS)).otherwise(lit(0L))
          .cast("bigint").as("r"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val withDeg = ranks.join(outdeg, Seq("node"), "left")
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("r")), lit(0L))).head().getLong(0)
      val dShare = dangling / nS // teleports to the seeds
      val inflow = withDeg.join(e, withDeg("node") === e("src"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      val prev = ranks
      ranks = nodes.join(inflow, Seq("node"), "left")
        .join(seedMark, Seq("node"), "left")
        .select(col("node"),
          (when(col("__seed").isNotNull, lit(baseSeed)).otherwise(lit(0L)) +
            expr(s"$dampNum * (coalesce(inflow, CAST(0 AS BIGINT)) + " +
              s"IF(__seed IS NOT NULL, $dShare, CAST(0 AS BIGINT))) " +
              s"div $dampDen"))
            .cast("bigint").as("r"))
        .localCheckpoint(true)
      if (tolMicro > 0) {
        val moved = ranks.join(
            prev.select(col("node"), col("r").as("r0")), Seq("node"))
          .agg(max(abs(col("r") - col("r0")))).head().getLong(0)
        converged = moved <= tolMicro
      }
      i += 1
    }
    e.unpersist(); outdeg.unpersist(); nodes.unpersist(); sd.unpersist()
    ranks.select(col("node"), col("r").as("rank"))
  }
}

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
  * over ITERATIONS, reading one scalar per pass — the dangling-mass
  * sum, harvested as an Observation metric DURING the eager
  * checkpoint of the rank state, so it costs zero extra jobs and
  * zero extra scans (r17; the r15 alternative of folding it into the
  * update job as a broadcast one-row frame was measured 6× SLOWER,
  * and the r16 shape paid a separate join+scan job per pass).
  * Out-degrees are computed once and CARRIED through the checkpointed
  * state — the per-pass state is (node, deg, rank) — so no iteration
  * re-joins the degree table.
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
    // r17 setup fusion (measured: setup was the largest jobs in the
    // profile — union+distinct for nodes, a second shuffle for
    // out-degrees, a count job, and an init join+checkpoint). ONE
    // shuffle now builds (node, deg) for every node — deg = count of
    // out-edges, null when dangling, exactly the old left-join — and
    // the node count + dangling-node count ride the checkpoint as
    // Observation metrics, so setup is one wide pass over 2|E| rows
    // plus zero extra jobs.
    val setupObs = org.apache.spark.sql.Observation()
    val state0 = e.select(col("src").as("node"), lit(1L).as("__o"))
      .union(e.select(col("dst").as("node"), lit(0L).as("__o")))
      .groupBy(col("node")).agg(sum(col("__o")).as("__deg0"))
      .select(col("node"),
        when(col("__deg0") > 0, col("__deg0")).otherwise(lit(null))
          .cast("bigint").as("deg"))
      .observe(setupObs, count(lit(1)).as("n"),
        coalesce(sum(when(col("deg").isNull, 1L).otherwise(0L)), lit(0L))
          .as("nDangling"))
      .localCheckpoint(true)
    val n = setupObs.get("n").asInstanceOf[Long]
    require(n > 0, "empty graph")
    val nDangling = setupObs.get("nDangling").asInstanceOf[Long]
    val base = scale * (dampDen - dampNum) / (dampDen * n) // driver longs
    // r17 per-iteration fusion (measured: the old shape scheduled ~10
    // jobs/iteration — the dangling scalar was its own join+scan job
    // and outdeg was re-joined TWICE per pass). The state now CARRIES
    // deg through every checkpoint, and the dangling mass rides the
    // checkpoint materialization itself as an Observation metric —
    // zero extra jobs, zero extra joins per pass. Ranks themselves
    // are untouched integer algebra (deg-null nodes never match
    // e.src, so pre-filtering the contribution join is a no-op on
    // the result; the spec pins bit-equality).
    def checkpointState(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val st = df.observe(obs,
          coalesce(sum(when(col("deg").isNull, col("r"))), lit(0L))
            .as("dangling"))
        .localCheckpoint(true) // eager: fires the observation too
      (st, obs.get("dangling").asInstanceOf[Long])
    }
    // initial ranks are uniform, so the initial dangling mass is a
    // driver product — no job, no physical r column needed yet
    var state = state0.withColumn("r", lit(scale / n))
    var dangling = (scale / n) * nDangling
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val dShare = dangling / n
      // ONE exchange per pass (r17): raw contributions and the
      // previous state (zero-contribution carrier rows — exactly one
      // per node, so max(deg) recovers each node's degree) feed the
      // SAME hash aggregate; the old shape paid the contribution
      // groupBy AND a state join-back (a second exchange or a
      // broadcast build) for the same integers.
      val contrib = state.filter(col("deg").isNotNull)
        .join(e, state("node") === e("src"))
        .select(col("dst").as("node"), lit(null).cast("bigint").as("deg"),
          expr("r div deg").as("c"))
      val prev = state
      val (st, dg) = checkpointState(
        prev.select(col("node"), col("deg"),
            lit(null).cast("bigint").as("c"))
          .union(contrib)
          .groupBy(col("node"))
          .agg(max(col("deg")).as("deg"), sum(col("c")).as("inflow"))
          .select(col("node"), col("deg"),
            (lit(base) +
              expr(s"$dampNum * (coalesce(inflow, CAST(0 AS BIGINT)) + $dShare) div $dampDen")
            ).cast("bigint").as("r")))
      state = st; dangling = dg
      if (tolMicro > 0) {
        val moved = state.join(
            prev.select(col("node"), col("r").as("r0")), Seq("node"))
          .agg(max(abs(col("r") - col("r0")))).head().getLong(0)
        converged = moved <= tolMicro
      }
      i += 1
    }
    e.unpersist()
    state.select(col("node"), col("r").as("rank"))
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
    val sd = seeds.select(col(seedCol).cast("bigint").as("node"))
      .distinct().persist()
    val nS = sd.count()
    require(nS > 0, "personalized PageRank: empty seed set")
    // r17 setup fusion (the [[run]] shape): ONE shuffle builds
    // (node, deg, __seed) for every node, and the node/seed/dangling
    // counts ride the checkpoint as Observation metrics. The
    // missing-seeds refusal compares the observed in-graph seed count
    // against |seeds| — the enumerating left-anti join is only run on
    // the FAILURE path, for the error message.
    val setupObs = org.apache.spark.sql.Observation()
    val state0 = e.select(col("src").as("node"), lit(1L).as("__o"))
      .union(e.select(col("dst").as("node"), lit(0L).as("__o")))
      .groupBy(col("node")).agg(sum(col("__o")).as("__deg0"))
      .select(col("node"),
        when(col("__deg0") > 0, col("__deg0")).otherwise(lit(null))
          .cast("bigint").as("deg"))
      .join(sd.withColumn("__seed", lit(1)), Seq("node"), "left")
      .observe(setupObs,
        coalesce(sum(when(col("__seed").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("nSeedIn"),
        coalesce(sum(when(col("__seed").isNotNull && col("deg").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("nSeedDangling"))
      .localCheckpoint(true)
    if (setupObs.get("nSeedIn").asInstanceOf[Long] != nS) {
      val missing = sd.join(
        state0.select(col("node")), Seq("node"), "left_anti")
      require(missing.isEmpty,
        "personalized PageRank: seeds missing from the graph — a silent " +
          "drop would redistribute the restart mass " +
          s"(first few: ${missing.limit(3).collect().mkString(", ")})")
    }
    val nSeedDangling = setupObs.get("nSeedDangling").asInstanceOf[Long]
    val baseSeed = scale * (dampDen - dampNum) / (dampDen * nS)
    def checkpointState(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val st = df.observe(obs,
          coalesce(sum(when(col("deg").isNull, col("r"))), lit(0L))
            .as("dangling"))
        .localCheckpoint(true)
      (st, obs.get("dangling").asInstanceOf[Long])
    }
    // init = the restart distribution itself; uniform on the seeds,
    // so the initial dangling mass is a driver product
    var state = state0.withColumn("r",
      when(col("__seed").isNotNull, lit(scale / nS)).otherwise(lit(0L))
        .cast("bigint"))
    var dangling = (scale / nS) * nSeedDangling
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val dShare = dangling / nS // teleports to the seeds
      // ONE exchange per pass — the [[run]] shape, with the seed flag
      // riding the carrier rows
      val contrib = state.filter(col("deg").isNotNull)
        .join(e, state("node") === e("src"))
        .select(col("dst").as("node"), lit(null).cast("bigint").as("deg"),
          lit(null).cast("int").as("__seed"), expr("r div deg").as("c"))
      val prev = state
      val (st, dg) = checkpointState(
        prev.select(col("node"), col("deg"), col("__seed").cast("int"),
            lit(null).cast("bigint").as("c"))
          .union(contrib)
          .groupBy(col("node"))
          .agg(max(col("deg")).as("deg"), max(col("__seed")).as("__seed"),
            sum(col("c")).as("inflow"))
          .select(col("node"), col("deg"), col("__seed"),
            (when(col("__seed").isNotNull, lit(baseSeed)).otherwise(lit(0L)) +
              expr(s"$dampNum * (coalesce(inflow, CAST(0 AS BIGINT)) + " +
                s"IF(__seed IS NOT NULL, $dShare, CAST(0 AS BIGINT))) " +
                s"div $dampDen"))
              .cast("bigint").as("r")))
      state = st; dangling = dg
      if (tolMicro > 0) {
        val moved = state.join(
            prev.select(col("node"), col("r").as("r0")), Seq("node"))
          .agg(max(abs(col("r") - col("r0")))).head().getLong(0)
        converged = moved <= tolMicro
      }
      i += 1
    }
    e.unpersist(); sd.unpersist()
    state.select(col("node"), col("r").as("rank"))
  }
}

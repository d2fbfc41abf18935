package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D SKYLINE (Pareto frontier): rows not dominated by
  * any other row, where `b` dominates `a` iff `b.minCol <= a.minCol`
  * and `b.maxCol >= a.maxCol` with at least one strict. The classic
  * "cheapest hotels closest to the beach" operator (Börzsönyi et al.,
  * ICDE 2001) — in a curation pipeline, the cost/quality frontier of
  * candidate corpora.
  *
  * The naive formulation is a quadratic NOT EXISTS self-join (the
  * DuckDB oracle uses exactly that, as an independent derivation).
  * The 2-D case is fully declarative: sorted by `minCol` ascending, a
  * row survives iff
  *
  *  - no row with a strictly smaller `minCol` has `maxCol >=` ours
  *    (frame `RANGE UNBOUNDED PRECEDING .. -1` over an integer sort
  *    key — the `-1` offset is what encodes "strictly smaller"), and
  *  - no row with `minCol <=` ours has a strictly larger `maxCol`
  *    (frame `.. CURRENT ROW`; including the row itself is harmless
  *    since `x > x` is false).
  *
  * Scale shape, two phases, NO global window anywhere (PlanAudit
  * rightly flags `Window` without PARTITION BY and single-partition
  * exchanges as critical):
  *
  *  1. LOCAL skyline per hash shard — the two windows partitioned by
  *     shard (parallel, bounded state); filtering inside a shard is
  *     sound because a same-shard dominator already disproves global
  *     frontier membership. Prunes the bulk without a global order.
  *  2. GLOBAL pass over the survivors as a distributed PREFIX-MAX
  *     (the [[PrefixSum]] two-pass discipline with max for sum):
  *     range-partition on `minCol` (layout pinned by eager
  *     localCheckpoint), per-partition maxCol maxima (one row per
  *     partition) to the driver, cumulated into per-partition
  *     "best maxCol strictly before this partition" offsets, then
  *     partition-LOCAL windows combined with the broadcast offset.
  *     Range partitioning never splits equal `minCol` keys, so
  *     "earlier partition" is exactly "strictly smaller minCol" and
  *     the offset slots into the strict frame soundly.
  */
object Skyline {

  /** Frontier of (`minCol` minimized, `maxCol` maximized). Both must
    * be integral (the strict-inequality RANGE frame offsets by -1 and
    * the prefix-max sentinel is Long.MinValue). `shardCol`
    * hash-buckets the local phase.
    */
  def pareto2d(df: DataFrame, minCol: String, maxCol: String,
               shardCol: Column, shards: Int = 64): DataFrame = {
    val sharded = df.withColumn("__shard", pmod(shardCol, lit(shards)))
    val base = Window.partitionBy(col("__shard")).orderBy(col(minCol))
    val m1 = max(col(maxCol)).over(
      base.rangeBetween(Window.unboundedPreceding, -1))
    val m2 = max(col(maxCol)).over(
      base.rangeBetween(Window.unboundedPreceding, 0))
    val local = sharded
      .withColumn("__dom1", m1).withColumn("__dom2", m2)
      .filter((col("__dom1").isNull || col("__dom1") < col(maxCol)) &&
        col("__dom2") <= col(maxCol))
      .drop("__shard", "__dom1", "__dom2")
    globalPass(local, minCol, maxCol)
  }

  /** Exact skyline of `in` via range partitioning + prefix-max — no
    * unpartitioned window, no single-partition exchange.
    */
  private def globalPass(in: DataFrame, minCol: String, maxCol: String)
  : DataFrame = {
    val spark = in.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val ranged = in.repartitionByRange(n, col(minCol))
      .localCheckpoint(true) // pin the sampled range layout
    val withPid = ranged.withColumn("__pid",
      spark_partition_id().cast("long"))
    // model-sized: one (pid, max) row per partition
    val maxima = withPid.groupBy(col("__pid"))
      .agg(max(col(maxCol)).as("__mx")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val before = (0 until n).map { p =>
      p.toLong -> (0L until p.toLong).flatMap(maxima.get)
        .foldLeft(Long.MinValue)(_ max _)
    }
    val offDf = broadcast(
      spark.createDataFrame(before).toDF("__pid", "__before"))
    val base = Window.partitionBy(col("__pid")).orderBy(col(minCol))
    val m1l = max(col(maxCol)).over(
      base.rangeBetween(Window.unboundedPreceding, -1))
    val m2l = max(col(maxCol)).over(
      base.rangeBetween(Window.unboundedPreceding, 0))
    withPid.join(offDf, Seq("__pid"))
      .withColumn("__m1",
        greatest(coalesce(m1l, lit(Long.MinValue)), col("__before")))
      .withColumn("__m2", greatest(m2l, col("__before")))
      .filter(col("__m1") < col(maxCol) && col("__m2") <= col(maxCol))
      .drop("__pid", "__before", "__m1", "__m2")
  }

  /** Incremental maintenance under INSERTS: since a dominated point
    * can never re-enter the frontier when points are only added,
    * `skyline(S ∪ T) = skyline(skyline(S) ∪ T)` — each batch costs
    * the (tiny) current frontier plus the batch, never a recompute
    * over history. (Deletes invalidate this identity: a deleted
    * frontier point can resurrect points it dominated — use the
    * k-layer state of [[kLayers]] / `StreamSkyline.applyCdcBatch` for
    * that case.)
    */
  def insertMaintain(currentSkyline: DataFrame, batch: DataFrame,
                     minCol: String, maxCol: String, shardCol: Column,
                     shards: Int = 64): DataFrame =
    pareto2d(currentSkyline.unionByName(batch), minCol, maxCol,
      shardCol, shards)

  /** First `k` skyline LAYERS ("onion peeling"): layer 1 is the
    * frontier, layer i the frontier of the set with layers 1..i−1
    * removed. The dominated-candidate retention that makes DELETE
    * maintenance possible:
    *
    *  - INSERTS preserve per-layer exactness — adding points only
    *    pushes points deeper, so `kLayers(S ∪ T) =
    *    kLayers(kLayers(S) ∪ T)`, the same fold identity as the plain
    *    frontier's.
    *  - A point's layer index is 1 + its longest dominance chain, so
    *    DELETING one point raises any layer index by at most 1, and
    *    deleting a point BEYOND layer k (not retained) cannot touch
    *    layers 1..k at all (dominators are strictly shallower). Hence
    *    d in-state deletions leave layers 1..k−d exact — the frontier
    *    survives up to k−1 cumulative in-state deletes between full
    *    rebuilds, and a consumer tracking the remaining budget can
    *    refuse (demand a rebuild) instead of going silently wrong.
    *
    * Cost: k peeling passes, each a [[pareto2d]] over the shrinking
    * remainder — sized for frontier-view state (model-sized), not for
    * one-shot 100 TB inputs. `idCol` must be unique (the peel
    * anti-joins each extracted layer out by id, so coincident points
    * stay distinguishable).
    *
    * @return input rows of the first k layers + `__layer` (1-based)
    */
  def kLayers(df: DataFrame, minCol: String, maxCol: String,
              idCol: String, k: Int, shards: Int = 64): DataFrame = {
    require(k >= 1, s"kLayers: k must be >= 1, got $k")
    var remaining = df.localCheckpoint(true)
    var acc: Option[DataFrame] = None
    var i = 1
    var empty = remaining.isEmpty
    while (i <= k && !empty) {
      val layer = pareto2d(remaining, minCol, maxCol, col(idCol), shards)
        .localCheckpoint(true)
      val tagged = layer.withColumn("__layer", lit(i))
      acc = Some(acc.map(_.unionByName(tagged)).getOrElse(tagged))
      remaining = remaining.join(layer.select(col(idCol)), Seq(idCol),
        "left_anti").localCheckpoint(true)
      empty = remaining.isEmpty
      i += 1
    }
    acc.getOrElse(df.withColumn("__layer", lit(1)).limit(0))
  }
}

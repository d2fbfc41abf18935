package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
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
  * Here the 2-D case is fully declarative in two window passes:
  * sorted by `minCol` ascending, a row survives iff
  *
  *  - no row with a strictly smaller `minCol` has `maxCol >=` ours
  *    (frame `RANGE UNBOUNDED PRECEDING .. -1` over an integer sort
  *    key — the `-1` offset is what encodes "strictly smaller"), and
  *  - no row with `minCol <=` ours has a strictly larger `maxCol`
  *    (frame `.. CURRENT ROW`; including the row itself is harmless
  *    since `x > x` is false).
  *
  * Scale shape: a global window would sort everything in ONE task, so
  * the skyline runs in the standard two phases — a LOCAL skyline per
  * hash shard (window partitioned by shard; filtering inside a shard
  * is sound because a dominator in the same shard proves the row is
  * not on the global frontier) prunes the bulk in parallel, then the
  * GLOBAL pass runs the same two windows over the few survivors
  * (skylines over real-valued attributes are tiny relative to input;
  * the local pass bounds the single-task work by the sum of shard
  * skylines, not the input).
  */
object Skyline {

  /** Frontier of (`minCol` minimized, `maxCol` maximized). Both must
    * be integral (the strict-inequality RANGE frame offsets by -1).
    * `shardCol` hash-buckets the local phase.
    */
  def pareto2d(df: DataFrame, minCol: String, maxCol: String,
               shardCol: Column, shards: Int = 64): DataFrame = {

    def survivors(in: DataFrame, part: Option[Column]): DataFrame = {
      def frame(w: WindowSpec, upper: Long) =
        w.orderBy(col(minCol)).rangeBetween(Window.unboundedPreceding, upper)
      val base = part.fold(Window.partitionBy())(p => Window.partitionBy(p))
      val strictlyBelow = max(col(maxCol)).over(frame(base, -1))
      val upToHere = max(col(maxCol)).over(frame(base, 0))
      in.withColumn("__dom1", strictlyBelow)
        .withColumn("__dom2", upToHere)
        .filter((col("__dom1").isNull || col("__dom1") < col(maxCol)) &&
          col("__dom2") <= col(maxCol))
        .drop("__dom1", "__dom2")
    }

    val sharded = df.withColumn("__shard", pmod(shardCol, lit(shards)))
    val local = survivors(sharded, Some(col("__shard"))).drop("__shard")
    // global pass over the (small) union of local skylines
    survivors(local, None)
  }

  /** Incremental maintenance under INSERTS: since a dominated point
    * can never re-enter the frontier when points are only added,
    * `skyline(S ∪ T) = skyline(skyline(S) ∪ T)` — each batch costs
    * the (tiny) current frontier plus the batch, never a recompute
    * over history. (Deletes invalidate this identity: a deleted
    * frontier point can resurrect points it dominated — full
    * recompute, or keep the dominated candidates, for that case.)
    */
  def insertMaintain(currentSkyline: DataFrame, batch: DataFrame,
                     minCol: String, maxCol: String, shardCol: Column,
                     shards: Int = 64): DataFrame =
    pareto2d(currentSkyline.unionByName(batch), minCol, maxCol,
      shardCol, shards)
}

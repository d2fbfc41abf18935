package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized JOIN view — the delta
  * rule of classical IVM: for insert deltas ΔA, ΔB against state
  * A, B,
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * so the maintained view advances by joining each DELTA against the
  * other side's pre-delta state — the historical fact tables are
  * probed, never re-joined against each other. Exact: union of
  * disjoint cases (old×old is the existing view; new rows appear in
  * exactly one of the three delta terms), so maintain() ==
  * full recompute row-for-row, which `q65_incremental_join` pins
  * against the DuckDB full-join oracle.
  *
  * 100 TB shape: a nightly delta is orders of magnitude smaller than
  * the fact history, so AQE broadcasts the delta sides and the two
  * big-side terms cost one SCAN of each fact table (no fact-fact
  * shuffle; with the state tables bucketed on the key —
  * [[graft.sinks.BucketedTables]] — even the probe side's exchange
  * disappears). The ΔA ⋈ ΔB term is delta-sized on both sides.
  * Deletes/updates compose via the CDC operators: apply
  * [[graft.cdc.CdcMerge]] to each side's state first, then feed the
  * net inserts here.
  */
object IncrementalJoin {

  /** The view increment for insert-deltas `aDelta`/`bDelta` against
    * pre-delta states `aOld`/`bOld`, equi-joined on `keys`.
    */
  def joinDelta(aOld: DataFrame, aDelta: DataFrame,
                bOld: DataFrame, bDelta: DataFrame,
                keys: Seq[String]): DataFrame =
    aDelta.join(bOld, keys)
      .unionByName(aOld.join(bDelta, keys))
      .unionByName(aDelta.join(bDelta, keys))

  /** Advance the maintained view by one delta batch. */
  def maintain(viewOld: DataFrame, aOld: DataFrame, aDelta: DataFrame,
               bOld: DataFrame, bDelta: DataFrame,
               keys: Seq[String]): DataFrame =
    viewOld.unionByName(joinDelta(aOld, aDelta, bOld, bDelta, keys))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}

/** Shared machinery for the size-routing convention
  * ([[Components]] / [[RankCorr.cumFromCountsWith]] /
  * [[Ranking.globalRank]] / [[PrefixSum.runningTotal]]): decide the
  * local-vs-distributed route without paying for the decision.
  *
  * The r17 probe pin (observe + eager localCheckpoint) ran
  * UNCONDITIONALLY, which taxed above-cap callers with a full extra
  * materialization (measured: q93_weighted_median +25%,
  * q165_jonckheere +20%). Plan statistics cannot gate it — measured
  * at sf0.1, the optimizer's sizeInBytes puts a 583k-row aggregate at
  * 2.2 MB (4 B/row) and a 150-row aggregate at 4.1 MB (27 KB/row),
  * with rowCount None everywhere: the estimate orders real candidates
  * BACKWARDS. What IS knowable for free: the schema (key types rule
  * the local route out before any pin) and the plan SHAPE — an input
  * that is already a materialized scan (a caller's localCheckpoint, a
  * cached relation, local rows) needs no pin at all, because
  * re-reading it is exactly as cheap as reading a fresh pin; a plain
  * count() probes it without the re-serialization.
  */
private[graft] object SizeRoute {

  /** True when the frame's optimized plan is already a materialized
    * scan — a checkpoint/`parallelize` RDD, a cached relation, or
    * driver-local rows — under at most Filter/Project wrappers.
    * Re-checkpointing such an input only re-serializes bytes that are
    * already sitting in block storage; recomputing it twice costs two
    * cheap scans. (Class-name match: LogicalRDD and InMemoryRelation
    * are private[sql].)
    */
  @annotation.tailrec
  def isMaterializedScan(plan: LogicalPlan): Boolean = plan match {
    case f: Filter => isMaterializedScan(f.child)
    case p: Project => isMaterializedScan(p.child)
    case leaf =>
      val n = leaf.getClass.getSimpleName.stripSuffix("$")
      n == "LogicalRDD" || n == "LocalRelation" || n == "InMemoryRelation"
  }

  def isMaterializedScan(df: DataFrame): Boolean =
    isMaterializedScan(df.queryExecution.optimizedPlan)
}

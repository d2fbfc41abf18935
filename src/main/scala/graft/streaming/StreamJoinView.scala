package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.IncrementalJoin

/** STREAMING materialized join view — the unbounded-state complement
  * of the watermarked stream-stream join (18d): that operator evicts
  * state at the watermark (bounded memory, late matches dropped by
  * contract); this one maintains a TABLE — every A row eventually
  * meets every matching B row regardless of arrival skew, the
  * CDC/table-maintenance semantics where "late" data is just data.
  *
  * Per microbatch (ΔA, ΔB), the classical IVM delta rule appends
  * `ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB` to the view, then records both
  * deltas in per-batch state dirs ([[BatchDirs]] layout). State reads
  * anchor to batches STRICTLY BEFORE the current id, and every write
  * is an overwrite of this batch's dirs — so a replayed microbatch
  * reproduces its exact increment (effectively-once, the replay
  * protocol shared with the other streaming operators). Tiered
  * consolidation bounds the dir count; all three stores are
  * append-only, so the identity merge is lossless.
  *
  * At 100 TB: per-batch cost is the delta sides probing the
  * accumulated states (AQE broadcasts small deltas — the fact-sized
  * states are scanned, never shuffled against each other) plus the
  * delta×delta term; state I/O is append-only and O(batch) per batch.
  */
object StreamJoinView {

  private def aRoot(root: String) = s"$root/a_state"
  private def bRoot(root: String) = s"$root/b_state"
  private def vRoot(root: String) = s"$root/view"

  private def priorState(spark: SparkSession, root: String, batchId: Long,
                         emptyLike: DataFrame): DataFrame = {
    val dirs = BatchDirs.before(spark, root, batchId)
    if (dirs.isEmpty) emptyLike.limit(0)
    else dirs.map { case (_, d) => spark.read.parquet(d) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** `foreachBatch` body: append this batch's view increment and
    * record its deltas. Either delta may be empty.
    */
  def applyBatch(spark: SparkSession, aDelta: DataFrame, bDelta: DataFrame,
                 root: String, batchId: Long, keys: Seq[String],
                 consolidateEvery: Int = 8): Unit = {
    val aOld = priorState(spark, aRoot(root), batchId, aDelta)
    val bOld = priorState(spark, bRoot(root), batchId, bDelta)
    IncrementalJoin.joinDelta(aOld, aDelta, bOld, bDelta, keys)
      .write.mode("overwrite").parquet(s"${vRoot(root)}/batch_$batchId")
    aDelta.write.mode("overwrite").parquet(s"${aRoot(root)}/batch_$batchId")
    bDelta.write.mode("overwrite").parquet(s"${bRoot(root)}/batch_$batchId")
    if (consolidateEvery > 0 && batchId > 0 &&
        batchId % consolidateEvery == 0) {
      Seq(aRoot(root), bRoot(root), vRoot(root)).foreach { r =>
        BatchDirs.consolidate(spark, r, batchId)
      }
    }
  }

  /** The maintained view: union of all committed increments. */
  def view(spark: SparkSession, root: String): DataFrame =
    BatchDirs.read(spark, vRoot(root))
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations.Check

/** Per-micro-batch data-quality monitoring — the streaming form of
  * [[graft.operators.Expectations]], the shape of Deequ's windowed
  * verification: every batch is independently validated against the
  * contract and its report persisted, so a quality regression is
  * attributable to the batch that introduced it.
  *
  * Semantics are deliberately batch-local: checks like uniqueness or
  * minimum volume are evaluated WITHIN each batch (cross-batch
  * uniqueness is stateful dedup's business — [[StreamDedup]] et al).
  * Reports ride the [[BatchDirs]] protocol: replay overwrites the
  * same `batch_N` report (effectively-once), consolidation appends
  * report rows losslessly (identity merge — reports are facts, not
  * state to resolve).
  */
object StreamExpectations {

  /** `foreachBatch` body: validate and persist this batch's report. */
  def applyBatch(spark: SparkSession, batch: DataFrame, root: String,
                 batchId: Long, checks: Seq[Check],
                 consolidateEvery: Int = 16): Unit = {
    Expectations.validate(batch, checks)
      .withColumn("batch_id", lit(batchId))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/batch_$batchId")
    if (consolidateEvery > 0 && batchId > 0 &&
        batchId % consolidateEvery == 0) {
      BatchDirs.consolidate(spark, root, batchId)
    }
  }

  /** Every persisted per-batch report row. */
  def reports(spark: SparkSession, root: String): DataFrame =
    BatchDirs.read(spark, root)

  /** Contract health across the stream so far: total violations and
    * the count/ids of failing batches per check.
    */
  def summary(spark: SparkSession, root: String): DataFrame =
    reports(spark, root)
      .groupBy(col("check_name"))
      .agg(sum(col("n_violations")).as("total_violations"),
        count(lit(1)).as("n_batches"),
        sum(when(col("passed"), 0L).otherwise(1L)).as("n_failed_batches"),
        min(col("passed")).as("all_passed"))
}

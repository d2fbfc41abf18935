package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IvfPqIndex

/** STREAMING maintenance of a saved IVFADC index — the coded twin of
  * [[StreamIvfRefresh]] (same delta-root protocol, byte-for-byte):
  * each microbatch of new vectors is coarse-assigned + PQ-encoded
  * under the saved (fixed) models and written to its own
  * `delta/batch_<id>` directory (partitioned by the coarse id, like
  * the base lists) with overwrite — a replayed microbatch rewrites
  * its directory instead of duplicating codes, the base `lists/`
  * stays immutable, and [[IvfPqIndex.topK]] reads base + complete
  * delta roots with partition pruning in every root. What crosses
  * the stream boundary is numSub BYTES per vector, not the floats —
  * the IVFADC scan economy extends to the delta path.
  *
  * Models stay fixed (recall degrades only with distribution drift —
  * retrain + save + restart then; the coarse-assignment drift guard
  * lives on the float index's refresher and applies unchanged).
  * Delta roots consolidate into `delta/compact_<n>` every
  * `compactEvery` batches via the shared
  * [[StreamIvfRefresh.consolidate]] (the protocol is layout-generic
  * over c-partitioned rows).
  */
object StreamIvfPqRefresh {

  val DefaultCompactEvery = 64

  def start(vecStream: DataFrame, idCol: String, vecCol: String,
            dir: String, checkpointDir: String,
            compactEvery: Int = DefaultCompactEvery): StreamingQuery = {
    vecStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, idCol, vecCol, dir, batchId, compactEvery)
        ()
      }
      .start()
  }

  /** One microbatch; factored out for replay and direct pipeline use.
    * Returns the number of vectors encoded and written.
    */
  def applyBatch(batch: DataFrame, idCol: String, vecCol: String,
                 dir: String, batchId: Long,
                 compactEvery: Int = DefaultCompactEvery): Long = {
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      StreamIvfRefresh.consolidate(spark, dir, batchId)
    val model = IvfPqIndex.load(spark, dir)
    val enc = IvfPqIndex.encoded(batch, idCol, vecCol, model).persist()
    try {
      val n = enc.count()
      if (n > 0L)
        enc.write.mode("overwrite").partitionBy("c")
          .parquet(s"$dir/delta/batch_$batchId")
      n
    } finally enc.unpersist()
  }
}

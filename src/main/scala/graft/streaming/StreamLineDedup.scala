package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LineDedup

/** Corpus-wide line dedup over a document STREAM: a line is kept in
  * the first document that ARRIVES carrying it and dropped from every
  * later document — the incremental form of
  * [[graft.operators.LineDedup]] (`text_line_dedup`). When documents
  * arrive in id order the result equals the batch operator exactly
  * (spec'd); under arbitrary arrival the keeper is the first arrival,
  * which is the only definable "first" on an unbounded stream.
  *
  * State is the set of line hashes seen in PRIOR batches, stored as
  * append-only parquet of 8-byte longs in per-batch-id directories:
  * batch N dedups against `state/batch_<i<N>` only and OVERWRITES its
  * own `state/batch_N` + `out/batch_N`, so a replayed microbatch
  * reproduces identical output instead of dropping everything against
  * its own first attempt's state (effectively-once, same discipline
  * as [[StreamDecontaminate]]). Within a batch, first occurrence =
  * smallest (id, line_no), exactly like the batch operator.
  *
  * Scale shape: per-batch exchanges carry line hashes and positions
  * only (the batch operator's hash-first plan); the prior-hash state
  * is a parquet scan of longs joined by hash — no driver-side state,
  * no state store growth beyond the distinct-line hash set itself.
  */
object StreamLineDedup {

  def start(docsStream: DataFrame, idCol: String, textCol: String,
            outDir: String, stateDir: String, checkpointDir: String,
            sep: String = "\n"): StreamingQuery = {
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, idCol, textCol, sep, outDir, stateDir, batchId)
        ()
      }
      .start()
  }

  /** One microbatch: dedup against prior-batch hashes, write survivors
    * and this batch's newly-seen hashes (both keyed by batch id so
    * replays overwrite). Factored out of the stream for direct use in
    * an incremental batch pipeline (same state layout).
    */
  def applyBatch(batch: DataFrame, idCol: String, textCol: String,
                 sep: String, outDir: String, stateDir: String,
                 batchId: Long): Unit = {
    val spark = batch.sparkSession
    val docs = batch.select(col(idCol),
      split(col(textCol), java.util.regex.Pattern.quote(sep)).as("__lines"))
    val keys = LineDedup.lineKeys(docs, idCol, "__lines")
    val unseen = priorHashes(spark, stateDir, batchId) match {
      case Some(p) => keys.join(p, Seq("__lh"), "left_anti")
      case None    => keys
    }
    // first occurrence WITHIN the batch among unseen lines — the
    // batch operator's keeper rule against (prior-state ∪ this batch).
    // Persisted: both the state write and the reassembly read it, and
    // recomputing it would re-run the anti-join against the whole
    // prior-state union twice per microbatch.
    val keeperRows = LineDedup.keepers(unseen, idCol).persist()
    try {
      keeperRows.select(col("__lh"))
        .write.mode("overwrite").parquet(s"$stateDir/batch_$batchId")
      LineDedup.reassemble(docs, keeperRows, idCol, "__lines", sep)
        .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
    } finally keeperRows.unpersist()
  }

  /** Union of hash sets committed by batches strictly before `batchId`.
    * Listed through the Hadoop filesystem of `stateDir`, so state can
    * live on any supported store (local, hdfs, s3a), not just the
    * driver's local disk.
    */
  private def priorHashes(spark: SparkSession, stateDir: String,
                          batchId: Long): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val dirs = fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_"))
      .filter(_.getPath.getName.stripPrefix("batch_").toLong < batchId)
      .map(_.getPath.toString)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** Read back everything the stream has emitted so far. */
  def results(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/batch_*")
}

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
  * append-only parquet of 8-byte longs in a [[VersionedDeltaState]]
  * snapshot chain (the same fenced [[graft.sinks.TableVersions]]
  * protocol [[BucketedCdcState]] uses): batch N dedups against the
  * state anchored at the newest commit TAGGED < N, so a replayed
  * microbatch reproduces identical output instead of dropping
  * everything against its own first attempt's state (effectively-once,
  * same discipline as [[StreamDecontaminate]]); a zombie driver that
  * lost a failover race is fenced at commit. Within a batch, first
  * occurrence = smallest (id, line_no), exactly like the batch
  * operator.
  *
  * Scale shape: per-batch exchanges carry line hashes and positions
  * only (the batch operator's hash-first plan); the prior-hash state
  * is a parquet scan of longs joined by hash — no driver-side state,
  * no state store growth beyond the distinct-line hash set itself.
  * State segments are consolidated (and superseded versions pruned)
  * every `compactEvery` batches, so the prior-hash scan stays
  * O(compactEvery) directories on a long-lived stream instead of one
  * small dir per microbatch forever.
  */
object StreamLineDedup {

  /** Default consolidation cadence: prior-state reads scan at most
    * this many batch dirs plus one compacted dir.
    */
  val DefaultCompactEvery = 64

  def start(docsStream: DataFrame, idCol: String, textCol: String,
            outDir: String, stateDir: String, checkpointDir: String,
            sep: String = "\n",
            compactEvery: Int = DefaultCompactEvery): StreamingQuery = {
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, idCol, textCol, sep, outDir, stateDir, batchId,
          compactEvery)
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
                 batchId: Long,
                 compactEvery: Int = DefaultCompactEvery): Unit = {
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      consolidate(batch.sparkSession, stateDir, batchId)
      // output side: append-only survivors, plain-union merge — keeps
      // a long stream's results() read bounded in directory count
      BatchDirs.consolidate(batch.sparkSession, outDir, batchId)
    }
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
      VersionedDeltaState.append(spark, stateDir,
        keeperRows.select(col("__lh")), tag = batchId)
      LineDedup.reassemble(docs, keeperRows, idCol, "__lines", sep)
        .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
    } finally keeperRows.unpersist()
  }

  /** Union of hash sets committed by batches strictly before `batchId`
    * — the [[VersionedDeltaState]] replay anchor, read through the
    * Hadoop filesystem of `stateDir`, so state can live on any
    * supported store (local, hdfs, s3a), not just the driver's local
    * disk.
    */
  private def priorHashes(spark: SparkSession, stateDir: String,
                          batchId: Long): Option[DataFrame] =
    VersionedDeltaState.stateBefore(spark, stateDir, batchId)

  /** Merge the state segments visible to batch `uptoExclusive` into
    * one distinct hash set, then reclaim superseded versions. Replay
    * safe: a re-run anchors to its first attempt's merged commit and
    * no-ops; the consolidating batch still dedups against exactly the
    * prior-batch hash set.
    */
  private[streaming] def consolidate(spark: SparkSession, stateDir: String,
                                     uptoExclusive: Long): Unit = {
    VersionedDeltaState.consolidate(spark, stateDir, uptoExclusive,
      merge = _.distinct())
    VersionedDeltaState.prune(spark, stateDir)
  }

  /** Read back everything the stream has emitted so far (consolidated
    * dirs included).
    */
  def results(spark: SparkSession, outDir: String): DataFrame =
    BatchDirs.read(spark, outDir)
}

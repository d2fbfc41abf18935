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
  * Per-batch state dirs are consolidated every `compactEvery` batches
  * into one `compact_<n>` dir (covering batches 0..n), so the
  * prior-hash scan stays O(compactEvery) directories on a long-lived
  * stream instead of one small dir per microbatch forever.
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
      keeperRows.select(col("__lh"))
        .write.mode("overwrite").parquet(s"$stateDir/batch_$batchId")
      LineDedup.reassemble(docs, keeperRows, idCol, "__lines", sep)
        .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
    } finally keeperRows.unpersist()
  }

  private def fsOf(spark: SparkSession, dir: String) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** State dirs of the given prefix, as (covered batch id, path),
    * complete ones only (`_SUCCESS` present — a consolidation killed
    * mid-write leaves a dir that must be ignored and overwritten).
    */
  private def listState(fs: org.apache.hadoop.fs.FileSystem,
                        path: org.apache.hadoop.fs.Path,
                        prefix: String): Seq[(Long, String)] = {
    if (!fs.exists(path)) return Nil
    fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(st => st.getPath.getName.stripPrefix(prefix).toLong -> st.getPath.toString)
      .sortBy(_._1)
  }

  /** Union of hash sets committed by batches strictly before `batchId`:
    * the newest consolidated dir covering batches <= M, plus the
    * per-batch dirs in (M, batchId). Listed through the Hadoop
    * filesystem of `stateDir`, so state can live on any supported
    * store (local, hdfs, s3a), not just the driver's local disk.
    */
  private def priorHashes(spark: SparkSession, stateDir: String,
                          batchId: Long): Option[DataFrame] = {
    val (fs, path) = fsOf(spark, stateDir)
    val compactBase = listState(fs, path, "compact_")
      .filter(_._1 < batchId).lastOption
    val floor = compactBase.map(_._1).getOrElse(-1L)
    val dirs = compactBase.map(_._2).toSeq ++
      listState(fs, path, "batch_")
        .filter { case (i, _) => i > floor && i < batchId }
        .map(_._2)
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** Consolidate every state dir covering batches < `uptoExclusive`
    * into one `compact_<uptoExclusive-1>` dir, then drop the covered
    * dirs. Idempotent and replay-safe: the target is keyed by the
    * batch range it covers, a half-written target (no `_SUCCESS`) is
    * rewritten from its still-present inputs, and a replay that finds
    * the target complete only re-runs the (idempotent) cleanup. Never
    * touches `uptoExclusive` itself, so replaying the consolidating
    * batch still dedups against exactly the prior-batch hash set.
    */
  private[streaming] def consolidate(spark: SparkSession, stateDir: String,
                                     uptoExclusive: Long): Unit = {
    val (fs, path) = fsOf(spark, stateDir)
    val target = uptoExclusive - 1
    val targetPath = new org.apache.hadoop.fs.Path(path, s"compact_$target")

    def cleanup(): Unit = {
      listState(fs, path, "batch_").filter(_._1 < uptoExclusive)
        .foreach { case (_, d) => fs.delete(new org.apache.hadoop.fs.Path(d), true) }
      listState(fs, path, "compact_").filter(_._1 < target)
        .foreach { case (_, d) => fs.delete(new org.apache.hadoop.fs.Path(d), true) }
    }

    if (fs.exists(new org.apache.hadoop.fs.Path(targetPath, "_SUCCESS"))) {
      cleanup(); return
    }
    val compactBase = listState(fs, path, "compact_").filter(_._1 < target).lastOption
    val floor = compactBase.map(_._1).getOrElse(-1L)
    val inputs = compactBase.map(_._2).toSeq ++
      listState(fs, path, "batch_")
        .filter { case (i, _) => i > floor && i < uptoExclusive }
        .map(_._2)
    if (inputs.isEmpty) return
    spark.read.parquet(inputs: _*).distinct()
      .write.mode("overwrite").parquet(targetPath.toString)
    cleanup()
  }

  /** Read back everything the stream has emitted so far (consolidated
    * dirs included).
    */
  def results(spark: SparkSession, outDir: String): DataFrame =
    BatchDirs.read(spark, outDir)
}

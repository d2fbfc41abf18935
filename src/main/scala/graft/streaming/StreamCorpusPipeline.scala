package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Decontaminate

/** STREAMING corpus-preparation pipeline — the continuously-ingesting
  * form of [[graft.operators.CorpusPipeline]]'s standard chain:
  * per microbatch, quality gate → cross-batch EXACT dedup
  * (first-arrival-wins) → benchmark decontamination, with survivors
  * and a per-batch attrition report persisted under the [[BatchDirs]]
  * replay-overwrite protocol.
  *
  * State is the set of normalized-text hashes kept so far, held in a
  * [[VersionedDeltaState]] snapshot chain exactly like
  * [[StreamLineDedup]]'s (tag-anchored replay reads, K-batch
  * consolidation + prune, zombie fencing) — per-batch state I/O is
  * O(batch + state segments), and hashes are recorded at the DEDUP
  * stage, so a doc dropped later by decontamination still blocks its
  * future copies (an identical copy would be identically
  * contaminated).
  *
  * The probe shingle set is computed once and cached across batches
  * (the [[StreamDecontaminate]] convention); per-batch cost is one
  * scan of the batch plus the model-sized state reads.
  */
object StreamCorpusPipeline {

  val DefaultCompactEvery = 64

  def start(docsStream: DataFrame, idCol: String, textCol: String,
            probes: DataFrame, outDir: String, stateDir: String,
            reportDir: String, checkpointDir: String,
            minTokens: Int = 10, maxContamination: Double = 0.2,
            shingleN: Int = 3,
            compactEvery: Int = DefaultCompactEvery): StreamingQuery = {
    val spark = docsStream.sparkSession
    val probeShingles =
      Decontaminate.probeSet(probes, textCol, shingleN).cache()
    val q = try {
      docsStream.writeStream
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          applyBatch(batch, idCol, textCol, probeShingles, outDir,
            stateDir, reportDir, batchId, minTokens, maxContamination,
            shingleN, compactEvery)
          ()
        }
        .start()
    } catch {
      case e: Throwable => probeShingles.unpersist(); throw e
    }
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(event: QueryStartedEvent): Unit = ()
      override def onQueryProgress(event: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
        if (event.id == q.id) {
          probeShingles.unpersist()
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    q
  }

  /** One microbatch, factored out for direct incremental-batch use
    * (same state/output layout, same replay semantics).
    */
  def applyBatch(batch: DataFrame, idCol: String, textCol: String,
                 probeShingles: DataFrame, outDir: String, stateDir: String,
                 reportDir: String, batchId: Long, minTokens: Int = 10,
                 maxContamination: Double = 0.2, shingleN: Int = 3,
                 compactEvery: Int = DefaultCompactEvery): Unit = {
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      VersionedDeltaState.consolidate(spark, stateDir, batchId,
        merge = _.distinct())
      VersionedDeltaState.prune(spark, stateDir)
      BatchDirs.consolidate(spark, outDir, batchId)
      BatchDirs.consolidate(spark, reportDir, batchId)
    }
    // microbatch frames are small by construction; persisting the two
    // stage boundaries keeps the report counts and the downstream
    // writes on one computation each (the StreamLineDedup convention)
    val quality = batch.filter(
      size(filter(split(trim(col(textCol)), "\\s+"),
        t => length(t) > 0)) >= minTokens).persist()
    val withHash = quality.withColumn("__th",
      xxhash64(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")))
    val unseen = VersionedDeltaState.stateBefore(spark, stateDir, batchId)
      match {
        case Some(prior) => withHash.join(prior, Seq("__th"), "left_anti")
        case None => withHash
      }
    // first occurrence within the batch: smallest id per text hash
    val keepers = unseen.join(
      unseen.groupBy(col("__th")).agg(min(col(idCol)).as(idCol)),
      Seq("__th", idCol), "left_semi").persist()
    try {
      VersionedDeltaState.append(spark, stateDir,
        keepers.select(col("__th")).distinct(), tag = batchId)
      Decontaminate.decontaminateAgainst(keepers.drop("__th"),
          probeShingles, idCol, textCol, maxContamination, shingleN)
        .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      val nIn = batch.count()
      val nQuality = quality.count()
      val nDedup = keepers.count()
      val nClean = spark.read.parquet(s"$outDir/batch_$batchId").count()
      val report = Seq(
        (batchId, "quality_gate", nIn, nQuality),
        (batchId, "exact_dedup", nQuality, nDedup),
        (batchId, "decontaminate", nDedup, nClean))
      spark.createDataFrame(report)
        .toDF("batch_id", "stage", "docs_in", "docs_out")
        .withColumn("docs_dropped", col("docs_in") - col("docs_out"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$reportDir/batch_$batchId")
    } finally {
      keepers.unpersist()
      quality.unpersist()
    }
  }

  /** Everything the stream has kept so far. */
  def results(spark: SparkSession, outDir: String): DataFrame =
    BatchDirs.read(spark, outDir)

  /** Per-batch attrition rows across the stream so far. */
  def reports(spark: SparkSession, reportDir: String): DataFrame =
    BatchDirs.read(spark, reportDir)
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.wsTokens
import graft.plans.GraftFunctions

/** Streaming NEAR-duplicate dedup: each microbatch keeps only the
  * documents that are not near-duplicates of (a) an earlier-id
  * document in the same batch or (b) any previously KEPT document —
  * the incremental form of [[graft.operators.Dedup.minhashLsh]] +
  * drop, under the stream-wide first-arrival-wins rule the other
  * streaming dedup operators use.
  *
  * Candidates come from the same MinHash + LSH banding as the batch
  * operator (codegen'd signatures, band buckets carry ids only) and
  * are verified by SIGNATURE AGREEMENT (fraction of equal minhash
  * positions, an unbiased Jaccard estimate). The batch operator can
  * afford exact-Jaccard verification because both documents' shingle
  * sets are in hand; a stream would have to persist every kept
  * document's full shingle set (~8 bytes/token forever) to do the
  * same, so the state stores one `numHashes`-long signature per kept
  * document instead — fixed ~256 bytes regardless of document size.
  *
  * State layout (the scale story): kept documents' band postings
  * `(band, bh, doc, sig)` as parquet PARTITIONED by
  * `bkt = pmod(xxhash64(band, bh), stateBuckets)` in a
  * [[VersionedDeltaState]] snapshot chain (the fenced
  * [[graft.sinks.TableVersions]] protocol [[BucketedCdcState]] uses).
  * A microbatch computes the bucket set its own bands hash into and
  * reads ONLY those partitions of prior state — every state segment
  * is hive-partitioned by `bkt`, so the `isin` filter prunes each
  * segment's file listing and per-batch I/O is O(touched buckets +
  * batch), not O(all state). Replays anchor to the newest commit
  * TAGGED before their batch id (never their own first attempt's
  * state) and overwrite their own `out/batch_N` (effectively-once, as
  * [[StreamLineDedup]]); state segments are consolidated and
  * superseded versions pruned every `compactEvery` batches to keep
  * the directory count bounded, and a zombie driver that lost a
  * failover race is fenced at commit.
  *
  * Only SURVIVORS' postings enter the state: a dropped document is
  * within `threshold` of something already in state, so its bands
  * add near-zero candidate coverage but would grow hot buckets
  * linearly on a stream of repeated content (the degenerate case the
  * batch operator's `maxBucketSize` cap exists for). Consequence:
  * a chain D2~D1(dropped), D2!~D0(kept) keeps D2, where the batch
  * operator's connected components would drop it — across batches
  * the stream dedups against kept representatives, within a batch
  * against every earlier-id member.
  */
object StreamNearDedup {

  val DefaultStateBuckets = 64
  val DefaultCompactEvery = 64

  /** Over-cap band buckets (more members than this, batch-side or
    * state-side) are skipped during candidate generation — the
    * analog of the batch operator's `maxBucketSize`: a degenerate
    * batch of thousands of identical documents must not go quadratic
    * in one band bucket. (Identical documents still collide in their
    * OTHER bands; a corpus pathological in every band is exact
    * dedup's job, as in batch.)
    */
  val DefaultMaxBucketSize = 1000

  def start(docsStream: DataFrame, idCol: String, textCol: String,
            outDir: String, stateDir: String, checkpointDir: String,
            n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4,
            threshold: Double = 0.8,
            stateBuckets: Int = DefaultStateBuckets,
            compactEvery: Int = DefaultCompactEvery,
            maxBucketSize: Int = DefaultMaxBucketSize): StreamingQuery = {
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, idCol, textCol, outDir, stateDir, batchId,
          n, numHashes, rowsPerBand, threshold, stateBuckets, compactEvery,
          maxBucketSize)
        ()
      }
      .start()
  }

  /** One microbatch (factored out for direct incremental-pipeline use
    * and replay).
    */
  def applyBatch(batch: DataFrame, idCol: String, textCol: String,
                 outDir: String, stateDir: String, batchId: Long,
                 n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4,
                 threshold: Double = 0.8,
                 stateBuckets: Int = DefaultStateBuckets,
                 compactEvery: Int = DefaultCompactEvery,
                 maxBucketSize: Int = DefaultMaxBucketSize): Unit = {
    require(numHashes % rowsPerBand == 0, "numHashes must be divisible by rowsPerBand")
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      consolidate(spark, stateDir, batchId)
      // output side too: survivors are append-only (each doc lands in
      // exactly one batch dir, replays overwrite), so the merge is a
      // plain union — without this a long stream's results() read
      // lists one dir per microbatch forever
      BatchDirs.consolidate(spark, outDir, batchId)
    }

    val posts = postings(batch, idCol, textCol, n, numHashes, rowsPerBand,
      stateBuckets).persist()
    try {
      // bucket ids this batch touches — bounded by stateBuckets, so
      // this collect is model-sized by construction
      val touched = posts.select("bkt").distinct()
        .collect().map(_.getInt(0)).toSeq
      val minMatches = math.ceil(threshold * numHashes).toLong

      def agree(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => (x === y).cast("long")),
          lit(0L), (acc, v) => acc + v)

      // within-batch rule (any earlier-id member, mirroring the batch
      // operator's component rule on chains inside one batch) +
      // cross-history candidates against prior kept postings, read
      // partition-pruned to the touched buckets; over-cap buckets
      // skipped both sides — all via the shared BandedDedup core
      val dropped = BandedDedup.droppedDocs(posts,
        priorPostings(spark, stateDir, batchId, touched),
        similar = (x, y) => agree(x, y) >= minMatches,
        maxBucketSize = maxBucketSize)
      val survivors = batch.join(dropped.withColumnRenamed("doc", idCol),
        Seq(idCol), "left_anti")

      survivors.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      VersionedDeltaState.append(spark, stateDir,
        posts.join(dropped, Seq("doc"), "left_anti"),
        tag = batchId, partitionCols = Seq("bkt"))
    } finally posts.unpersist()
  }

  /** Band postings for a batch: (doc, band, bh, sig, bkt). */
  private[graft] def postings(batch: DataFrame, idCol: String,
      textCol: String, n: Int, numHashes: Int, rowsPerBand: Int,
      stateBuckets: Int): DataFrame = {
    GraftFunctions.register(batch.sparkSession)
    val numBands = numHashes / rowsPerBand
    batch
      .select(col(idCol).as("doc"),
        GraftFunctions.minhashFast(
          GraftFunctions.shingleFast(wsTokens(col(textCol)), n), numHashes)
          .as("sig"))
      .select(col("doc"), col("sig"),
        explode(transform(sequence(lit(0), lit(numBands - 1)), bnd =>
          struct(bnd.as("band"),
            xxhash64(slice(col("sig"), bnd * rowsPerBand + lit(1),
              lit(rowsPerBand)), bnd).as("bh")))).as("bucket"))
      .select(col("doc"), col("bucket.band"), col("bucket.bh"), col("sig"),
        pmod(xxhash64(col("bucket.band"), col("bucket.bh")), lit(stateBuckets))
          .cast("int").as("bkt"))
  }

  /** Union of kept postings from batches strictly before `batchId`,
    * read partition-pruned to `touched` buckets; None before the
    * first batch. Each state segment is read with its own root so
    * partition discovery maps `bkt=<k>` subdirectories, and the
    * `isin` filter prunes file listing per segment.
    */
  private[graft] def priorPostings(spark: SparkSession, stateDir: String,
      batchId: Long, touched: Seq[Int]): Option[DataFrame] = {
    if (touched.isEmpty) return None
    VersionedDeltaState.stateBefore(spark, stateDir, batchId)
      .map(_.filter(col("bkt").isin(touched: _*)))
  }

  /** Merge the state segments visible to batch `upTo` into one
    * (postings deduped per (doc, band)), then reclaim superseded
    * versions. A replayed consolidation anchors to its first
    * attempt's merged commit and no-ops.
    */
  private[graft] def consolidate(spark: SparkSession, stateDir: String,
      upTo: Long): Unit = {
    VersionedDeltaState.consolidate(spark, stateDir, upTo,
      merge = _.dropDuplicates("doc", "band"), partitionCols = Seq("bkt"))
    VersionedDeltaState.prune(spark, stateDir)
  }

  /** All surviving documents written so far (consolidated dirs
    * included).
    */
  def results(spark: SparkSession, outDir: String): DataFrame =
    BatchDirs.read(spark, outDir)
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Multimodal

/** Streaming near-duplicate IMAGE dedup: each microbatch keeps only
  * the images not perceptually equal (within `maxHamming` pHash bits)
  * to an earlier-id image in the same batch or to any previously KEPT
  * image — [[graft.operators.Multimodal.phashPairs]]' pairing turned
  * into the stream-wide first-arrival-wins rule the text dedup
  * operators use, sharing their machinery end to end:
  *
  *  - candidates from the 8-band byte bucket join with capped buckets
  *    and an exact `bit_count` residual ([[BandedDedup]] — the same
  *    core as [[StreamNearDedup]], with a 64-bit pHash where text
  *    carries a minhash array);
  *  - kept images' band postings `(band, bh, doc, sig)` in a
  *    [[VersionedDeltaState]] snapshot chain, segments PARTITIONED by
  *    `bkt = pmod(xxhash64(band, bh), stateBuckets)` so each batch
  *    reads only its touched buckets; tag-anchored replay reads,
  *    K-batch consolidation + prune, zombie-writer fencing — all
  *    inherited;
  *  - per-batch output dirs via [[BatchDirs]] (overwrite on replay →
  *    effectively-once), consolidated on the same cadence.
  *
  * Undecodable payloads produce no postings and are always KEPT — an
  * image the codec cannot read cannot be compared, and dropping it
  * would silently lose data.
  */
object StreamPhashDedup {

  val DefaultStateBuckets = 64
  val DefaultCompactEvery = 64
  val DefaultMaxBucketSize = 1000

  def start(imagesStream: DataFrame, idCol: String, payloadCol: String,
            outDir: String, stateDir: String, checkpointDir: String,
            maxHamming: Int = 6,
            stateBuckets: Int = DefaultStateBuckets,
            compactEvery: Int = DefaultCompactEvery,
            maxBucketSize: Int = DefaultMaxBucketSize): StreamingQuery = {
    imagesStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, idCol, payloadCol, outDir, stateDir, batchId,
          maxHamming, stateBuckets, compactEvery, maxBucketSize)
        ()
      }
      .start()
  }

  /** One microbatch (factored out for direct incremental-pipeline use
    * and replay).
    */
  def applyBatch(batch: DataFrame, idCol: String, payloadCol: String,
                 outDir: String, stateDir: String, batchId: Long,
                 maxHamming: Int = 6,
                 stateBuckets: Int = DefaultStateBuckets,
                 compactEvery: Int = DefaultCompactEvery,
                 maxBucketSize: Int = DefaultMaxBucketSize): Unit = {
    require(maxHamming <= 7,
      "maxHamming > 7 breaks the 8-band pigeonhole recall guarantee")
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      VersionedDeltaState.consolidate(spark, stateDir, batchId,
        merge = _.dropDuplicates("doc", "band"), partitionCols = Seq("bkt"))
      VersionedDeltaState.prune(spark, stateDir)
      BatchDirs.consolidate(spark, outDir, batchId)
    }

    val posts = postings(batch, idCol, payloadCol, stateBuckets).persist()
    try {
      val touched = posts.select("bkt").distinct()
        .collect().map(_.getInt(0)).toSeq
      val prior =
        if (touched.isEmpty) None
        else VersionedDeltaState.stateBefore(spark, stateDir, batchId)
          .map(_.filter(col("bkt").isin(touched: _*)))
      val dropped = BandedDedup.droppedDocs(posts, prior,
        similar = (x, y) => bit_count(x.bitwiseXOR(y)) <= lit(maxHamming),
        maxBucketSize = maxBucketSize)
      val survivors = batch.join(dropped.withColumnRenamed("doc", idCol),
        Seq(idCol), "left_anti")
      survivors.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      VersionedDeltaState.append(spark, stateDir,
        posts.join(dropped, Seq("doc"), "left_anti"),
        tag = batchId, partitionCols = Seq("bkt"))
    } finally posts.unpersist()
  }

  /** Band postings for a batch: (doc, sig, band, bh, bkt) — `sig` is
    * the 64-bit pHash, `bh` the band's byte. Undecodable payloads are
    * dropped here (no postings → always kept downstream).
    */
  private[graft] def postings(batch: DataFrame, idCol: String,
      payloadCol: String, stateBuckets: Int): DataFrame =
    Multimodal.phashes(batch.sparkSession,
        batch.select(col(idCol), col(payloadCol)), idCol, payloadCol)
      .select(col("doc_id").as("doc"), col("phash").as("sig"),
        explode(array((0 until 8).map(bnd =>
          struct(lit(bnd).as("band"),
            shiftright(col("phash"), bnd * 8).bitwiseAND(lit(255L))
              .as("bh"))): _*)).as("bb"))
      .select(col("doc"), col("sig"), col("bb.band"), col("bb.bh"),
        pmod(xxhash64(col("bb.band"), col("bb.bh")), lit(stateBuckets.toLong))
          .cast("int").as("bkt"))

  /** All surviving images written so far (consolidated dirs included). */
  def results(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    BatchDirs.read(spark, outDir)
}

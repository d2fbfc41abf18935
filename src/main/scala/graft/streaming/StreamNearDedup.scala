package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * `bkt = pmod(xxhash64(band, bh), stateBuckets)` under per-batch-id
  * directories. A microbatch computes the bucket set its own bands
  * hash into and reads ONLY those partitions of prior state — the
  * same partition-pruned incremental discipline as
  * [[BucketedCdcState]], so per-batch I/O is O(touched buckets +
  * batch), not O(all state). Replays overwrite their own
  * `out/batch_N` + `state/batch_N` (effectively-once, as
  * [[StreamLineDedup]]); per-batch state dirs are consolidated every
  * `compactEvery` batches to keep the directory count bounded.
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

      // skew cap on the batch side: only under-cap buckets enter
      // candidate generation (self- and cross-join both)
      val underCap = posts.groupBy("band", "bh")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") <= maxBucketSize)
        .select("band", "bh")
      val capped = posts.join(underCap, Seq("band", "bh"))

      // within-batch: a doc matching ANY earlier-id member (kept or
      // not) is dropped — mirrors the batch operator's component rule
      // on chains inside one batch
      val a = capped.select(col("band"), col("bh"),
        col("doc").as("doc_a"), col("sig").as("sig_a"))
      val b = capped.select(col("band"), col("bh"),
        col("doc").as("doc_b"), col("sig").as("sig_b"))
      val batchDropped = a.join(b, Seq("band", "bh"))
        .filter(col("doc_a") < col("doc_b"))
        .filter(agree(col("sig_a"), col("sig_b")) >= minMatches)
        .select(col("doc_b").as("doc")).distinct()

      // cross-history candidates: batch bands ⋈ prior kept postings,
      // read partition-pruned to the touched buckets; hot state-side
      // buckets (accumulated over the stream's life) are capped the
      // same way
      val dropped = (priorPostings(spark, stateDir, batchId, touched) match {
        case Some(prior) =>
          val priorUnderCap = prior.groupBy("band", "bh")
            .agg(count(lit(1)).as("hcnt"))
            .filter(col("hcnt") <= maxBucketSize)
            .select("band", "bh")
          capped.join(
              prior.join(priorUnderCap, Seq("band", "bh"))
                .select(col("band"), col("bh"), col("sig").as("h_sig")),
              Seq("band", "bh"))
            .filter(agree(col("sig"), col("h_sig")) >= minMatches)
            .select(col("doc")).distinct()
            .unionByName(batchDropped)
        case None => batchDropped
      }).distinct()
      val survivors = batch.join(dropped.withColumnRenamed("doc", idCol),
        Seq(idCol), "left_anti")

      survivors.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      posts.join(dropped, Seq("doc"), "left_anti")
        .write.mode("overwrite").partitionBy("bkt")
        .parquet(s"$stateDir/batch_$batchId")
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
    * first batch. Each state dir is read with its own root so
    * partition discovery maps `bkt=<k>` subdirectories, and the
    * `isin` filter prunes file listing per dir.
    */
  private[graft] def priorPostings(spark: SparkSession, stateDir: String,
      batchId: Long, touched: Seq[Int]): Option[DataFrame] = {
    val dirs = stateDirsBefore(spark, stateDir, batchId)
    if (dirs.isEmpty || touched.isEmpty) None
    else Some(dirs.map(d => spark.read.parquet(d))
      .reduce(_ unionByName _)
      .filter(col("bkt").isin(touched: _*)))
  }

  /** Newest complete consolidated dir covering batches <= M, plus
    * per-batch dirs in (M, batchId).
    */
  private def stateDirsBefore(spark: SparkSession, stateDir: String,
      batchId: Long): Seq[String] = {
    val (fs, path) = fsOf(spark, stateDir)
    val compacts = listState(fs, path, "compact_").filter(_._1 < batchId)
    val newest = compacts.lastOption
    val floor = newest.map(_._1).getOrElse(-1L)
    val batches = listState(fs, path, "batch_")
      .filter { case (id, _) => id > floor && id < batchId }
    newest.map(_._2).toSeq ++ batches.map(_._2)
  }

  /** Merge every state dir covering batches < upTo into one
    * `compact_<upTo-1>` dir (idempotent: keyed by the newest batch it
    * covers; a replay rewrites the same dir), then delete the merged
    * inputs.
    */
  private[graft] def consolidate(spark: SparkSession, stateDir: String,
      upTo: Long): Unit = {
    val dirs = stateDirsBefore(spark, stateDir, upTo)
    if (dirs.size <= 1) return
    val covered = upTo - 1
    val target = s"$stateDir/compact_$covered"
    // a replayed consolidation finds its own complete output among the
    // inputs; re-writing it from a plan that reads it would destroy
    // the source mid-write, so only the leftover inputs are deleted
    val (fs, _) = fsOf(spark, stateDir)
    val alreadyDone = fs.exists(new Path(target, "_SUCCESS"))
    if (!alreadyDone) {
      dirs.map(d => spark.read.parquet(d)).reduce(_ unionByName _)
        .dropDuplicates("doc", "band")
        .write.mode("overwrite").partitionBy("bkt").parquet(target)
    }
    dirs.filterNot(_.stripSuffix("/").endsWith(s"compact_$covered"))
      .foreach(d => fs.delete(new Path(d), true))
    // a crash between the compact write and these deletes leaves
    // batch/compact dirs at or below the floor that stateDirsBefore
    // no longer lists — sweep them here so they cannot leak forever
    listState(fs, new Path(stateDir), "batch_")
      .filter(_._1 <= covered)
      .foreach { case (_, d) => fs.delete(new Path(d), true) }
    listState(fs, new Path(stateDir), "compact_")
      .filter(_._1 < covered)
      .foreach { case (_, d) => fs.delete(new Path(d), true) }
  }

  /** All surviving documents written so far (consolidated dirs
    * included).
    */
  def results(spark: SparkSession, outDir: String): DataFrame =
    BatchDirs.read(spark, outDir)

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val path = new Path(dir)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** Complete (`_SUCCESS`-marked) state dirs with the given prefix
    * that hold at least one parquet file, as (batch id, path)
    * ascending. A batch whose documents were ALL dropped (or whose
    * survivors all matched existing state) commits a marker-only
    * directory with zero part files; `spark.read.parquet` cannot
    * infer a schema from it, and it contributes nothing, so it is
    * skipped rather than poisoning every later batch's state read.
    */
  private def listState(fs: FileSystem, path: Path,
      prefix: String): Seq[(Long, String)] = {
    if (!fs.exists(path)) return Nil
    fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .filter(st => fs.exists(new Path(st.getPath, "_SUCCESS")))
      .filter(st => hasParquetFile(fs, st.getPath))
      .map(st => st.getPath.getName.stripPrefix(prefix).toLong -> st.getPath.toString)
      .sortBy(_._1)
  }

  private def hasParquetFile(fs: FileSystem, dir: Path): Boolean = {
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) return true
    }
    false
  }
}

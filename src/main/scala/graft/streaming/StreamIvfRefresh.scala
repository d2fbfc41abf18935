package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IvfIndex

/** STREAMING maintenance of a saved IVF ANN index: each microbatch of
  * new vectors is assigned under the saved (fixed) model and written
  * to its own delta directory; the probe path
  * ([[IvfIndex.topKIndexed]]) reads the base inverted file plus the
  * complete delta roots, partition-pruned in every root — searches
  * see new vectors one microbatch after arrival with no retrain and
  * no index rebuild.
  *
  * Effectively-once without touching the base index: the batch
  * refresh (`IvfIndex.refresh`) APPENDS into `lists/`, which a replay
  * would double — the stream instead writes each batch to
  * `delta/batch_<id>/` (partitioned by centroid, like the base) with
  * overwrite, so a replayed microbatch rewrites its own directory
  * byte-for-byte instead of duplicating vectors. The base `lists/`
  * stays immutable under streaming, so there is no swap window and
  * no reader coordination. Delta dirs consolidate into one
  * `delta/compact_<n>` every `compactEvery` batches (idempotent,
  * crash-swept) to bound the root count on a long-lived stream.
  *
  * The drift guard runs per microbatch against the train-time
  * baseline exactly as in the batch refresh; a `retrainAdvised`
  * batch logs a warning — retraining is the operator's decision
  * (train + save, then restart the stream on the new index).
  */
object StreamIvfRefresh {

  val DefaultCompactEvery = 64

  def start(vecStream: DataFrame, idCol: String, vecCol: String,
            dir: String, checkpointDir: String,
            driftThreshold: Double = 0.5,
            imbalanceThreshold: Double = 4.0,
            compactEvery: Int = DefaultCompactEvery): StreamingQuery = {
    vecStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, idCol, vecCol, dir, batchId,
          driftThreshold, imbalanceThreshold, compactEvery)
        ()
      }
      .start()
  }

  /** One microbatch; factored out for replay and direct pipeline use.
    * Returns the same drift/imbalance stats as the batch refresh.
    */
  def applyBatch(batch: DataFrame, idCol: String, vecCol: String,
                 dir: String, batchId: Long,
                 driftThreshold: Double = 0.5,
                 imbalanceThreshold: Double = 4.0,
                 compactEvery: Int = DefaultCompactEvery): IvfIndex.RefreshStats = {
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      consolidate(spark, dir, batchId)
    val model = IvfIndex.load(spark, dir)
    // indexes saved before the stats baseline existed: backfill from
    // the current base lists (same as the batch refresh)
    val statsPath = new Path(s"$dir/stats")
    val sfs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sfs.exists(statsPath))
      spark.read.parquet(s"$dir/lists").groupBy("c").count()
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    val assigned = IvfIndex.assign(batch, idCol, vecCol, model).persist()
    try {
      val deltaCounts = assigned.groupBy("c").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val deltaRows = deltaCounts.values.sum
      if (deltaRows == 0L)
        return IvfIndex.RefreshStats(0L, 0.0, 1.0, retrainAdvised = false)
      assigned.write.mode("overwrite").partitionBy("c")
        .parquet(s"$dir/delta/batch_$batchId")

      val baseCounts = spark.read.parquet(s"$dir/stats")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val baseRows = math.max(1L, baseCounts.values.sum)
      val drift = 0.5 * (0 until model.numCentroids).map { i =>
        math.abs(deltaCounts.getOrElse(i, 0L).toDouble / math.max(1L, deltaRows) -
          baseCounts.getOrElse(i, 0L).toDouble / baseRows)
      }.sum
      val current = IvfIndex.listRoots(spark, dir)
        .map(spark.read.parquet(_)).reduce(_ unionByName _)
        .groupBy("c").count().collect().map(_.getLong(1))
      val imbalance =
        if (current.isEmpty) 1.0
        else current.max.toDouble / (current.sum.toDouble / current.length)
      val advise = drift > driftThreshold || imbalance > imbalanceThreshold
      if (advise) org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"StreamIvfRefresh($dir) batch $batchId: drift=$drift " +
          s"imbalance=$imbalance — centroids no longer fit; retrain and save")
      IvfIndex.RefreshStats(deltaRows, drift, imbalance, advise)
    } finally assigned.unpersist()
  }

  /** Merge the delta roots covering batches < `upTo` into one
    * `delta/compact_<upTo-1>` (idempotent: a replay finds its own
    * complete output and only sweeps leftovers; the base `lists/` is
    * never rewritten).
    */
  private[graft] def consolidate(spark: SparkSession, dir: String,
                                 upTo: Long): Unit = {
    val deltaPath = new Path(s"$dir/delta")
    val fs = deltaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(deltaPath)) return
    val covered = upTo - 1
    val target = new Path(deltaPath, s"compact_$covered")
    // every complete delta root except the base lists
    val roots = IvfIndex.listRoots(spark, dir)
      .filterNot(_.stripSuffix("/").endsWith("/lists"))
      .filter { d =>
        val name = new Path(d).getName
        val id = name.split("_").last.toLong
        id < upTo || name.startsWith("compact_")
      }
    if (roots.size <= 1) {
      // replay after a crash between writing compact_<covered> and
      // sweeping: finish the interrupted sweep (idempotent), gated on
      // the compact's completion marker — with a single UN-merged
      // root the sweep would destroy live data
      if (fs.exists(new Path(target, "_SUCCESS")))
        sweepBelow(fs, deltaPath, covered)
      return
    }
    if (!fs.exists(new Path(target, "_SUCCESS"))) {
      roots.map(spark.read.parquet(_)).reduce(_ unionByName _)
        .write.mode("overwrite").partitionBy("c").parquet(target.toString)
    }
    roots.filterNot(_.stripSuffix("/").endsWith(s"compact_$covered"))
      .foreach(d => fs.delete(new Path(d), true))
    // crash-swept leftovers below the floor
    sweepBelow(fs, deltaPath, covered)
  }

  private def sweepBelow(fs: FileSystem, deltaPath: Path, covered: Long): Unit = {
    if (!fs.exists(deltaPath)) return
    fs.listStatus(deltaPath).toSeq
      .filter(_.isDirectory)
      .foreach { st =>
        val name = st.getPath.getName
        val keep =
          (name.startsWith("compact_") && name.stripPrefix("compact_").toLong >= covered) ||
            (name.startsWith("batch_") && name.stripPrefix("batch_").toLong > covered)
        if (!keep) fs.delete(st.getPath, true)
      }
  }
}

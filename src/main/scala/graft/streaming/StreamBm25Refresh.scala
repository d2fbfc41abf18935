package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Bm25Index

/** STREAMING maintenance of a saved BM25 inverted index — the text
  * twin of [[StreamIvfRefresh]]: each microbatch of new documents is
  * tokenized and written as its own (postings, df, stats) delta root;
  * [[Bm25Index.query]] reads the base index plus every complete delta
  * root with bucket pruning in each, so searches see new documents
  * one microbatch after arrival with no rebuild.
  *
  * Effectively-once without touching the base index: the batch
  * refresh ([[Bm25Index.refresh]]) APPENDS into the base tables,
  * which a replay would double — the stream instead writes each
  * batch to `delta/batch_<id>/` with overwrite, so a replayed
  * microbatch rewrites its own directory byte-for-byte. Every
  * statistic the scorer reads is a SUM over file rows (tf rows, df
  * delta rows, (n, sumdl) stat rows), so "union of roots" IS the
  * refreshed index — exactly the property the batch refresh relies
  * on, lifted to per-batch directories. Within a root, `stats` is
  * written LAST and is the completion marker: a crash mid-batch
  * leaves an invisible root that the replay rewrites whole.
  *
  * Delta roots consolidate into one `delta/compact_<n>` every
  * `compactEvery` batches (idempotent, crash-swept) to bound the
  * root count on a long-lived stream — the [[StreamIvfRefresh]]
  * convention.
  */
object StreamBm25Refresh {

  val DefaultCompactEvery = 64

  def start(docStream: DataFrame, idCol: String, textCol: String,
            dir: String, checkpointDir: String,
            compactEvery: Int = DefaultCompactEvery): StreamingQuery = {
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, idCol, textCol, dir, batchId, compactEvery)
        ()
      }
      .start()
  }

  /** One microbatch; factored out for replay and direct pipeline use.
    * Returns the number of delta documents written.
    */
  def applyBatch(batch: DataFrame, idCol: String, textCol: String,
                 dir: String, batchId: Long,
                 compactEvery: Int = DefaultCompactEvery): Long = {
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      consolidate(spark, dir, batchId)
    val n = batch.count()
    if (n == 0L) return 0L
    // Bm25Index.build writes postings → df → stats in order with
    // overwrite — stats/_SUCCESS landing last is exactly the
    // completion-marker contract listRoots checks
    Bm25Index.build(batch, idCol, textCol, s"$dir/delta/batch_$batchId")
    n
  }

  /** Merge the delta roots covering batches < `upTo` into one
    * `delta/compact_<upTo-1>` (idempotent: a replay finds its own
    * complete output and only sweeps leftovers; the base index is
    * never rewritten).
    */
  private[graft] def consolidate(spark: SparkSession, dir: String,
                                 upTo: Long): Unit = {
    val deltaPath = new Path(s"$dir/delta")
    val fs = deltaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(deltaPath)) return
    val covered = upTo - 1
    val target = s"$dir/delta/compact_$covered"
    val roots = Bm25Index.listRoots(spark, dir)
      .filterNot(_ == dir)
      .filter { d =>
        val name = new Path(d).getName
        name.split("_").last.toLong < upTo || name.startsWith("compact_")
      }
    if (roots.size <= 1) {
      // replay after a crash between writing compact_<covered> and
      // sweeping: the complete compact is the only visible root (the
      // floor hides the stale batch dirs, so queries are correct, but
      // the disk leaks until the NEXT compaction) — finish the
      // interrupted sweep (idempotent). Gated on the compact's
      // completion marker: with a single UN-merged root the sweep
      // would destroy live data.
      if (fs.exists(new Path(target, "stats/_SUCCESS")))
        sweepBelow(fs, deltaPath, covered)
      return
    }
    if (!fs.exists(new Path(target, "stats/_SUCCESS"))) {
      def merged(sub: String): DataFrame =
        roots.map(r => spark.read.parquet(s"$r/$sub")).reduce(_ unionByName _)
      merged("postings").write.mode("overwrite").partitionBy("b")
        .parquet(s"$target/postings")
      merged("df").write.mode("overwrite").partitionBy("b")
        .parquet(s"$target/df")
      // stats last: its _SUCCESS is the root's completion marker
      merged("stats")
        .agg(sum(col("n")).cast("bigint").as("n"),
          sum(col("sumdl")).cast("bigint").as("sumdl"))
        .coalesce(1).write.mode("overwrite").parquet(s"$target/stats")
    }
    roots.filterNot(_.stripSuffix("/").endsWith(s"compact_$covered"))
      .foreach(d => fs.delete(new Path(d), true))
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

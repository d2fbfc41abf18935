package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Skyline
import graft.sinks.TableVersions

/** STREAMING skyline maintenance — the continuously-updated Pareto
  * frontier of an insert stream, through the batch identity
  * `skyline(S ∪ T) = skyline(skyline(S) ∪ T)`: each microbatch folds
  * into the (tiny) current frontier, never recomputing over history.
  *
  * Replay safety comes from ALGEBRA, not bookkeeping: inserts are
  * idempotent for a skyline (re-adding points cannot change
  * dominance), so a replayed microbatch folds in again and produces
  * the same frontier — no seen-set, no delta log. The frontier is
  * published through [[TableVersions]] (staging + atomic rename +
  * commit marker), so readers always see one complete committed
  * frontier and a crashed writer leaves only invisible staging
  * garbage that the next `begin` sweeps.
  *
  * Scale shape: per batch, cost = batch + current frontier through
  * the two-phase skyline (shard-local windows, range-partitioned
  * prefix-max — see [[Skyline]]); the state on disk is the frontier
  * itself, which for real-valued attributes is tiny relative to the
  * stream's history.
  */
object StreamSkyline {

  def start(stream: DataFrame, minCol: String, maxCol: String,
            idCol: String, dir: String, checkpointDir: String,
            shards: Int = 64): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, minCol, maxCol, idCol, dir, shards)
        ()
      }
      .start()

  /** One microbatch; factored out for replay and direct use. */
  def applyBatch(batch: DataFrame, minCol: String, maxCol: String,
                 idCol: String, dir: String, shards: Int = 64): Unit = {
    val spark = batch.sparkSession
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val input = TableVersions.current(fs, root) match {
      case Some(v) =>
        spark.read.parquet(
          new Path(TableVersions.dataDir(root, v), "frontier").toString)
          .unionByName(batch)
      case None => batch
    }
    val sky = Skyline.pareto2d(input, minCol, maxCol, col(idCol), shards)
    val pending = TableVersions.begin(fs, root)
    // data under a SUBDIR of the staging dir: a parquet overwrite of
    // the staging dir itself would wipe the writer token fence
    sky.write.parquet(new Path(pending.dir, "frontier").toString)
    TableVersions.commit(fs, root, pending)
    TableVersions.prune(fs, root, keep = 4)
  }

  /** The current committed frontier (empty schema-less read refused —
    * call only after at least one batch committed).
    */
  def frontier(spark: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = TableVersions.current(fs, root).getOrElse(
      throw new IllegalStateException(s"StreamSkyline($dir): no committed frontier yet"))
    spark.read.parquet(
      new Path(TableVersions.dataDir(root, v), "frontier").toString)
  }
}

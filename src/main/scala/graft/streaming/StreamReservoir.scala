package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sinks.TableVersions

/** STREAMING weighted reservoir sampling — a k-row sample, selection
  * probability ∝ weight, maintained continuously over an insert
  * stream and EXACTLY equal to the batch
  * [[graft.operators.Sampling.weightedSample]] over everything seen.
  *
  * The trick is that A-ES keys are DETERMINISTIC here: the
  * Efraimidis-Spirakis exponential `−ln(u)/w` draws its uniform from
  * md5(id, salt), not a RNG, so "the k smallest keys of the union" is
  * a pure function of the data seen. Streaming maintenance is then
  * the same fold as the skyline's: keep the k smallest keys of
  * (current reservoir ∪ batch) — and replays are no-ops by algebra
  * (re-offering a row cannot change the k smallest). State is the
  * k-row reservoir itself, published through [[TableVersions]].
  *
  * Scale shape: per batch one TakeOrdered over (reservoir + batch)
  * with bounded per-partition heaps — never a sort of history; state
  * on disk is k rows.
  */
object StreamReservoir {

  def start(stream: DataFrame, idCol: String, weightCol: String,
            k: Int, dir: String, checkpointDir: String,
            salt: String = "wsample"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, idCol, weightCol, k, dir, salt)
        ()
      }
      .start()

  /** One microbatch; factored out for replay and direct use. */
  def applyBatch(batch: DataFrame, idCol: String, weightCol: String,
                 k: Int, dir: String, salt: String = "wsample"): Unit = {
    val spark = batch.sparkSession
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val input = TableVersions.current(fs, root) match {
      case Some(v) =>
        spark.read.parquet(
          new Path(TableVersions.dataDir(root, v), "sample").toString)
          .unionByName(batch)
        // a re-delivered row appears twice in the union: its A-ES key
        // is identical both times, and the id tie-break collapses the
        // pair, so the k smallest are unchanged — replay-safe
      case None => batch
    }
    val sample = graft.operators.Sampling
      .weightedSample(input.dropDuplicates(idCol), idCol, weightCol, k, salt)
    val pending = TableVersions.begin(fs, root)
    sample.write.parquet(new Path(pending.dir, "sample").toString)
    TableVersions.commit(fs, root, pending)
    TableVersions.prune(fs, root, keep = 4)
  }

  /** The current committed reservoir. */
  def reservoir(spark: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = TableVersions.current(fs, root).getOrElse(
      throw new IllegalStateException(
        s"StreamReservoir($dir): no committed reservoir yet"))
    spark.read.parquet(
      new Path(TableVersions.dataDir(root, v), "sample").toString)
  }
}

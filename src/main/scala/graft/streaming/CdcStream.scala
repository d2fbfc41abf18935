package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.cdc.{CdcColumns, CdcMerge}
import graft.config.JdbcConnection
import graft.sinks.{JdbcMergedApply, TableVersions}

/** Continuous CDC apply (SURVEY.md §2a row 17): the reference's batch
  * copy-loop (TableReader.scala:191) becomes a Structured Streaming
  * `foreachBatch` merge. Each micro-batch is compacted into a
  * key-latest state table; deletes are retained as tombstones so late
  * out-of-order ops resolve by sequence, not arrival.
  *
  * File state is INCREMENTAL and hash-bucketed
  * ([[BucketedCdcState]]): a micro-batch reads and rewrites only the
  * buckets its keys hash into, under a [[graft.sinks.TableVersions]]
  * snapshot-chain commit — per-batch cost is O(|touched buckets| +
  * |batch|), not O(|total state|), which is the difference between a
  * streaming merge and a full table rewrite per batch at 100 TB.
  */
object CdcStream {

  /** Default bucket count for the file state. Sized so one bucket's
    * rewrite is a small fraction of total state; production tables
    * size it to (total state / target rewrite unit).
    */
  val DefaultBuckets = 64

  /** Latest committed state version; None before the first commit.
    * Resolves the filesystem through the session's Hadoop conf, so
    * state roots on stores configured via `spark.hadoop.*` (s3a,
    * hdfs) resolve exactly like every other read of the same root.
    */
  def currentVersion(spark: SparkSession, stateDir: String): Option[Long] = {
    val p = new Path(stateDir)
    TableVersions.current(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Latest compacted state INCLUDING tombstones; None before the
    * first commit.
    */
  def stateWithTombstones(spark: SparkSession, stateDir: String): Option[DataFrame] =
    BucketedCdcState.state(spark, stateDir)

  /** Live table view: latest state minus tombstoned keys. */
  def currentState(spark: SparkSession, stateDir: String,
                   opCol: String = CdcColumns.OperationCol): Option[DataFrame] =
    stateWithTombstones(spark, stateDir).map(_.filter(col(opCol) =!= CdcMerge.DeleteOp))

  /** Start the continuous merge of a coded CDC stream into `stateDir`.
    * Unreferenced state versions beyond a 2-commit reader window are
    * pruned as the stream advances, so state disk stays proportional
    * to the table, not the stream's lifetime.
    *
    * @param codedStream streaming DataFrame carrying the entity
    *        columns plus `opCol` and the sequence columns.
    */
  def start(codedStream: DataFrame, stateDir: String,
            keyCols: Seq[String], seqCols: Seq[String],
            checkpointDir: String,
            numBuckets: Int = DefaultBuckets): StreamingQuery = {
    codedStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        BucketedCdcState.applyBatch(batch, stateDir, keyCols, seqCols, numBuckets)
        BucketedCdcState.prune(batch.sparkSession, stateDir)
        ()
      }
      .start()
  }

  /** Continuous CDC apply into a LIVE JDBC merged table: every
    * micro-batch goes through [[graft.sinks.JdbcMergedApply]] —
    * one `max_by` exchange then executor-parallel guarded
    * UPDATE/INSERT/DELETE. Exactly-once END STATE without sink-side
    * transactions: the seqval guard makes a replayed micro-batch a
    * no-op (stale updates blocked, duplicate inserts swallowed), so
    * at-least-once delivery from the checkpoint still converges to
    * the latest-wins table.
    */
  def startJdbc(codedStream: DataFrame, conn: JdbcConnection, table: String,
                keyCols: Seq[String],
                seqCol: String = CdcColumns.SeqValCol,
                checkpointDir: String = "",
                batchSize: Int = 500): StreamingQuery = {
    val w = codedStream.writeStream
    val withCk = if (checkpointDir.nonEmpty) w.option("checkpointLocation", checkpointDir) else w
    withCk.foreachBatch { (batch: DataFrame, _: Long) =>
        JdbcMergedApply(batch, conn, table, keyCols,
          seqCol = seqCol, batchSize = batchSize)
        ()
      }
      .start()
  }
}

package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.cdc.{CdcColumns, CdcMerge}
import graft.config.JdbcConnection
import graft.sinks.JdbcMergedApply

/** Continuous CDC apply (SURVEY.md §2a row 17): the reference's batch
  * copy-loop (TableReader.scala:191) becomes a Structured Streaming
  * `foreachBatch` merge. Each micro-batch is compacted into a
  * key-latest state table; deletes are retained as tombstones so late
  * out-of-order ops resolve by sequence, not arrival.
  *
  * State is versioned (`state_v<n>` + VERSION pointer) so a write
  * never clobbers the version it is reading — the same
  * read-stable/atomic-commit idea as a table format's snapshot chain,
  * kept minimal for a local checkpoint.
  */
object CdcStream {

  private def versionFile(stateDir: String) = Paths.get(stateDir, "VERSION")

  def currentVersion(stateDir: String): Option[Long] = {
    val vf = versionFile(stateDir)
    if (Files.exists(vf)) Some(new String(Files.readAllBytes(vf), "UTF-8").trim.toLong)
    else None
  }

  /** Latest compacted state INCLUDING tombstones; None before the
    * first commit.
    */
  def stateWithTombstones(spark: SparkSession, stateDir: String): Option[DataFrame] =
    currentVersion(stateDir).map(v => spark.read.parquet(s"$stateDir/state_v$v"))

  /** Live table view: latest state minus tombstoned keys. */
  def currentState(spark: SparkSession, stateDir: String,
                   opCol: String = CdcColumns.OperationCol): Option[DataFrame] =
    stateWithTombstones(spark, stateDir).map(_.filter(col(opCol) =!= CdcMerge.DeleteOp))

  /** Start the continuous merge of a coded CDC stream into `stateDir`.
    *
    * @param codedStream streaming DataFrame carrying the entity
    *        columns plus `opCol` and the sequence columns.
    */
  def start(codedStream: DataFrame, stateDir: String,
            keyCols: Seq[String], seqCols: Seq[String],
            checkpointDir: String): StreamingQuery = {
    Files.createDirectories(Paths.get(stateDir))
    codedStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val merged = stateWithTombstones(spark, stateDir) match {
          case Some(prev) =>
            CdcMerge.latestByKey(
              prev.unionByName(batch, allowMissingColumns = true), keyCols, seqCols)
          case None => CdcMerge.latestByKey(batch, keyCols, seqCols)
        }
        val next = currentVersion(stateDir).getOrElse(-1L) + 1
        merged.write.mode("overwrite").parquet(s"$stateDir/state_v$next")
        Files.write(versionFile(stateDir), next.toString.getBytes("UTF-8"))
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

package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.cdc.{CdcColumns, CdcMerge}
import graft.config.JdbcConnection

/** JDBC output plumbing.
  *
  * The reference has two paths: row-at-a-time prepared statements
  * iterated on the driver (JdbcOutputWriter.scala:694,
  * `toLocalIterator` — the documented OOM source its own README
  * corrected), and the Spark JDBC sink (SparkJDBCWriter.scala). graft
  * only keeps the distributed sink: every executor writes its own
  * partition through `df.write.jdbc`.
  *
  * No database exists in this environment, so these methods build the
  * fully-configured writer and the exact frames the reference would
  * write; `rawFrame`/`mergedFrame` are oracle-checked via the cdc_*
  * queries, and the writer wiring is spec-tested up to the terminal
  * `.save()`.
  */
object JdbcSink {

  /** The raw-mode frame: CDC log as-is, jdbc-illegal columns fixed. */
  def rawFrame(df: DataFrame): DataFrame = CdcColumns.forJdbcTarget(df)

  /** The merged-mode frame: CDC ops applied, internal columns dropped
    * except the seqval watermark (JdbcOutputWriter.scala:351).
    */
  def mergedFrame(df: DataFrame, keyCols: Seq[String], seqCols: Seq[String]): DataFrame =
    CdcColumns.dropAllInternal(
      CdcMerge.applyOperations(CdcColumns.forJdbcTarget(df), keyCols, seqCols),
      keepSeqVal = true)

  /** Configured distributed JDBC writer (not yet executed). */
  def writer(df: DataFrame, conn: JdbcConnection, table: String,
             batchSize: Long = 5000L): org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] = {
    val mode = conn.jdbcSaveMode.toLowerCase match {
      case "overwrite" => SaveMode.Overwrite
      case "ignore" => SaveMode.Ignore
      case "errorifexists" => SaveMode.ErrorIfExists
      case _ => SaveMode.Append
    }
    df.write.mode(mode)
      .format("jdbc")
      .option("url", conn.jdbcUrl)
      .option("dbtable", s"${conn.jdbcSchema}.$table")
      .option("user", conn.jdbcUsername)
      .option("password", conn.jdbcPassword)
      .option("batchsize", batchSize.toString)
  }

  /** Execute the raw write. Requires a reachable database. */
  def writeRaw(df: DataFrame, conn: JdbcConnection, table: String,
               batchSize: Long = 5000L): Unit =
    writer(rawFrame(df), conn, table, batchSize).save()

  /** Execute the merged write. Requires a reachable database. */
  def writeMerged(df: DataFrame, conn: JdbcConnection, table: String,
                  keyCols: Seq[String], seqCols: Seq[String],
                  batchSize: Long = 5000L): Unit =
    writer(mergedFrame(df, keyCols, seqCols), conn, table, batchSize).save()
}

package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Internal-column management for CDC batches.
  *
  * Mirrors the reference semantics (cda-client TableReader.scala:
  * 444-486): columns prefixed `gwcbi___` are producer-internal and
  * dropped except the two that drive merge semantics (`operation`,
  * `seqval_hex`); the client adds its own `gwcdac__` provenance
  * columns. Pure column projections — Catalyst prunes them at the
  * scan, so dropped columns are never read at 100 TB.
  */
object CdcColumns {

  val InternalPrefix = "gwcbi___"
  val ClientPrefix = "gwcdac__"
  val OperationCol: String = InternalPrefix + "operation"
  val SeqValCol: String = InternalPrefix + "seqval_hex"
  val FingerprintCol: String = ClientPrefix + "fingerprintfolder"
  val TimestampFolderCol: String = ClientPrefix + "timestampfolder"

  /** Columns kept through `dropInternal` (TableReader.scala:49). */
  val relevantInternalColumns: Set[String] = Set(SeqValCol, OperationCol)

  /** Drop producer-internal columns except operation/seqval. */
  def dropInternal(df: DataFrame): DataFrame = {
    val dropList = df.columns.filter(c =>
      c.toLowerCase.startsWith(InternalPrefix) && !relevantInternalColumns.contains(c.toLowerCase))
    df.drop(dropList.toIndexedSeq: _*)
  }

  /** Drop every internal column including operation/seqval and client
    * provenance columns — the shape written by the merged sink
    * (JdbcOutputWriter.scala:351 keeps only seqval_hex; we expose both
    * policies).
    */
  def dropAllInternal(df: DataFrame, keepSeqVal: Boolean = true): DataFrame = {
    val dropList = df.columns.filter { c =>
      val lc = c.toLowerCase
      (lc.startsWith(InternalPrefix) || lc.startsWith(ClientPrefix)) &&
        !(keepSeqVal && lc == SeqValCol)
    }
    df.drop(dropList.toIndexedSeq: _*)
  }

  /** Add batch provenance columns (TableReader.scala:482-486). */
  def withBatchMeta(df: DataFrame, schemaFingerprint: String, timestampFolder: Long): DataFrame =
    df.withColumn(FingerprintCol, lit(schemaFingerprint))
      .withColumn(TimestampFolderCol, lit(timestampFolder.toString))

  /** JDBC-target column fixes (TableReader.scala:451-460): drop
    * columns that can't be written to a relational sink and rename
    * reserved identifiers.
    */
  def forJdbcTarget(df: DataFrame): DataFrame = {
    val dropList = df.columns.filter(c =>
      c.toLowerCase.contains("spatial") || c.toLowerCase == "textdata")
    df.withColumnRenamed("interval", "interval_").drop(dropList.toIndexedSeq: _*)
  }
}

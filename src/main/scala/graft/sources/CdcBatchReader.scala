package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{CdcColumns, Manifest, ManifestEntry, SchemaEvolution}

/** Incremental reader over the reference's data layout
  * (cda-client TableReader.scala:370-433):
  *
  * {{{ <base>/<table>/<schemaFingerprint>/<timestampFolder>/<files>.parquet }}}
  *
  * Scale design: all timestamp folders of one fingerprint are read by
  * a SINGLE `spark.read.parquet(paths: _*)` scan (one file index, one
  * scan node, full pushdown) instead of the reference's
  * one-DataFrame-per-folder union (TableReader.scala:496-517); the
  * provenance timestamp-folder column is recovered from the file path
  * at zero cost. Fingerprints with different schemas are then merged
  * with a name-based union resolved at plan time.
  */
object CdcBatchReader {

  case class FingerprintBatch(fingerprint: String, timestampFolders: Seq[Long], paths: Seq[String])

  /** List unprocessed (fingerprint, timestampFolder) batches for a
    * table: timestamp > savepoint, timestamp <= manifest's last safe
    * write (TableReader.scala:399-416).
    */
  def listBatches(tableName: String,
                  entry: ManifestEntry,
                  savepoint: Option[Long]): Seq[FingerprintBatch] = {
    val base = Paths.get(entry.dataFilesPath)
    val lastSafe = entry.lastSafeTimestamp
    val after = savepoint.getOrElse(-1L)
    Manifest.fingerprintsWithUnprocessedRecords(entry, savepoint).flatMap { fp =>
      val fpDir = base.resolve(fp)
      if (!Files.isDirectory(fpDir)) None
      else {
        val tsDirs = Files.list(fpDir).iterator().asScala
          .filter(Files.isDirectory(_))
          .flatMap(p => scala.util.Try(p.getFileName.toString.toLong).toOption.map(_ -> p))
          .filter { case (ts, _) => ts > after && ts <= lastSafe }
          .toSeq.sortBy(_._1)
        if (tsDirs.isEmpty) None
        else Some(FingerprintBatch(fp, tsDirs.map(_._1), tsDirs.map(_._2.toString)))
      }
    }
  }

  /** Read every unprocessed batch of a table into one DataFrame with
    * provenance columns, internal columns managed, schemas unified
    * across fingerprints. Returns None when there is nothing new.
    */
  def readTable(spark: SparkSession,
                tableName: String,
                entry: ManifestEntry,
                savepoint: Option[Long]): Option[DataFrame] = {
    val batches = listBatches(tableName, entry, savepoint)
    if (batches.isEmpty) None
    else Some(SchemaEvolution.unionEvolved(batches.map { b =>
      val df = spark.read.parquet(b.paths: _*)
      CdcColumns.dropInternal(df)
        .withColumn(CdcColumns.FingerprintCol, lit(b.fingerprint))
        .withColumn(CdcColumns.TimestampFolderCol,
          regexp_extract(input_file_name(), "/(\\d+)/[^/]+$", 1))
    }))
  }

  /** Highest timestamp folder read — the next savepoint value
    * (TableReader.scala:279).
    */
  def maxTimestamp(batches: Seq[FingerprintBatch]): Option[Long] =
    batches.flatMap(_.timestampFolders).maxOption
}

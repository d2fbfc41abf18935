package graft.cdc

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** One table's entry in the producer manifest (cda-client
  * ManifestReader.scala:7-10): where the data lives, the last safe
  * timestamp, and the schema-fingerprint history.
  */
case class ManifestEntry(lastSuccessfulWriteTimestamp: String,
                         totalProcessedRecordsCount: Long,
                         dataFilesPath: String,
                         schemaHistory: Map[String, String]) {
  def lastSafeTimestamp: Long = lastSuccessfulWriteTimestamp.toLong
}

/** Manifest parsing + the incremental-read planning logic
  * (which fingerprints still have unprocessed batches). Local-file
  * port of the reference's S3 manifest reader.
  */
object Manifest {

  type ManifestMap = Map[String, ManifestEntry]

  private val mapper = new ObjectMapper()

  def fromFile(path: String): ManifestMap =
    parseJson(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  def parseJson(json: String): ManifestMap = {
    val root = mapper.readTree(json)
    root.properties().asScala.map { e =>
      val n: JsonNode = e.getValue
      val history = Option(n.get("schemaHistory")).map { h =>
        h.properties().asScala.map(p => p.getKey -> p.getValue.asText()).toMap
      }.getOrElse(Map.empty)
      e.getKey -> ManifestEntry(
        lastSuccessfulWriteTimestamp = n.get("lastSuccessfulWriteTimestamp").asText(),
        totalProcessedRecordsCount =
          Option(n.get("totalProcessedRecordsCount")).map(_.asLong()).getOrElse(0L),
        dataFilesPath = n.get("dataFilesPath").asText(),
        schemaHistory = history)
    }.toMap
  }

  /** Restrict a manifest to a comma-delimited include list
    * (TableReader.scala:148-160); blank/empty keeps everything.
    */
  def filterTables(manifest: ManifestMap, tablesToInclude: String): ManifestMap = {
    val wanted = Option(tablesToInclude).getOrElse("").replace(" ", "")
    if (wanted.isEmpty) manifest
    else {
      val set = wanted.split(",").toSet
      manifest.filter { case (name, _) => set.contains(name) }
    }
  }

  /** Fingerprints that still have unprocessed batches given the last
    * processed timestamp (TableReader.scala:527-548): each
    * fingerprint owns the time interval [its timestamp, next
    * fingerprint's timestamp); it is pending if that interval ends
    * after the savepoint.
    */
  def fingerprintsWithUnprocessedRecords(entry: ManifestEntry,
                                         savepoint: Option[Long]): Seq[String] = {
    val lastProcessed = savepoint.getOrElse(-1L)
    val sorted = entry.schemaHistory.toSeq
      .map { case (fp, ts) => (fp, ts.toLong) }
      .sortBy(_._2)
    if (sorted.isEmpty) Seq.empty
    else {
      val ends = sorted.drop(1).map(_._2) :+ Long.MaxValue
      sorted.zip(ends).collect {
        case ((fp, _), end) if end > lastProcessed => fp
      }
    }
  }
}

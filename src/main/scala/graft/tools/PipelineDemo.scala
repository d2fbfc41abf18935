package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc._
import graft.config._
import graft.sinks._
import graft.sources.{CdcBatchReader, TableCatalog}
import graft.streaming.CdcStream

/** End-to-end usage example AND smoke surface for the full
  * reference-shaped pipeline: YAML config → manifest → incremental
  * CDC batch read → merge → file sinks (+ schema sidecar) →
  * continuous streaming merge. Run with:
  *
  * {{{ sbt "runMain graft.tools.PipelineDemo /root/testdata/sf0.001 /tmp/graft_demo" }}}
  */
object PipelineDemo {

  def main(args: Array[String]): Unit = {
    val Array(sfDir, work) = args.take(2)
    Files.createDirectories(Paths.get(work))
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. config
    Files.createDirectories(Paths.get(s"$work/sp"))
    val cfg = GraftConfig.fromYaml(
      s"""sourceLocation: {baseDir: $work/cdc, manifestPath: $work/cdc/manifest.json}
         |outputLocation: {path: $work/out}
         |savepointsLocation: {path: $work/sp}
         |outputSettings: {exportTarget: file, fileFormat: csv,
         |  saveAsSingleFile: true, saveIntoTimestampDirectory: true,
         |  tablesToInclude: events}
         |""".stripMargin)
    println(s"[demo] config ok: target=${cfg.outputSettings.exportTarget}/${cfg.outputSettings.fileFormat}")

    // 2. synthesize a CDC landing zone from the events table:
    //    two timestamp folders under one fingerprint + a manifest
    val coded = TableCatalog.events(spark, sfDir)
      .withColumn(CdcColumns.OperationCol,
        when(col("event_type") === "signup", 2)
          .when(col("event_type") === "error" &&
            regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int") < 10, 1)
          .otherwise(4))
      .withColumn("gwcbi___lsn", col("event_id")) // internal col to be dropped
    coded.filter(col("event_id") % 2 === 0).write.mode("overwrite")
      .parquet(s"$work/cdc/events/fp1/1000")
    coded.filter(col("event_id") % 2 =!= 0).write.mode("overwrite")
      .parquet(s"$work/cdc/events/fp1/2000")
    Files.write(Paths.get(s"$work/cdc/manifest.json"),
      s"""{"events": {"lastSuccessfulWriteTimestamp": "2000",
         |  "totalProcessedRecordsCount": 0,
         |  "dataFilesPath": "$work/cdc/events",
         |  "schemaHistory": {"fp1": "1000"}}}""".stripMargin.getBytes("UTF-8"))

    // 3. manifest + savepoints + incremental read
    val manifest = Manifest.filterTables(
      Manifest.fromFile(cfg.sourceLocation.manifestPath),
      cfg.outputSettings.tablesToInclude)
    val savepoints = new Savepoints(cfg.savepointsLocation.path)
    val entry = manifest("events")
    val batch = CdcBatchReader.readTable(spark, "events", entry,
      savepoints.getAsLong("events")).get
    val nRead = batch.count()
    require(!batch.columns.contains("gwcbi___lsn"), "internal column must be dropped")
    println(s"[demo] incremental read: $nRead rows from " +
      s"${CdcBatchReader.listBatches("events", entry, None).map(_.timestampFolders.size).sum} folders")

    // 4. merge to latest state and write csv + parquet + schema sidecar
    val merged = CdcMerge.applyOperations(batch, Seq("user_id"), Seq("ts", "event_id"))
    val layout = FileSink.Layout(cfg.outputLocation.path, "events", "fp1",
      Some(entry.lastSuccessfulWriteTimestamp))
    val csvPath = FileSink.writeCsv(merged, layout,
      header = cfg.outputSettings.includeColumnNames,
      singleFile = cfg.outputSettings.saveAsSingleFile)
    SchemaDoc.writeSchemaYaml(merged, csvPath)
    FileSink.writeParquet(merged,
      FileSink.Layout(s"${cfg.outputLocation.path}_parquet", "events", "fp1"))
    savepoints.write("events", entry.lastSuccessfulWriteTimestamp)
    println(s"[demo] merged state: ${merged.count()} entities -> $csvPath " +
      s"(savepoint=${savepoints.get("events").get})")

    // 5. second run: savepoint means nothing new
    val again = CdcBatchReader.readTable(spark, "events", entry, savepoints.getAsLong("events"))
    println(s"[demo] re-run after savepoint: newData=${again.isDefined}")

    // 6. continuous merge of the same log as a stream
    val stream = spark.readStream.schema(coded.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/cdc/events/fp1/*")
    val q = CdcStream.start(stream, s"$work/state", Seq("user_id"), Seq("ts", "event_id"),
      s"$work/ck")
    q.processAllAvailable(); q.stop()
    val streamState = CdcStream.currentState(spark, s"$work/state").get.count()
    println(s"[demo] streaming merge: $streamState live entities in " +
      s"${CdcStream.currentVersion(spark, s"$work/state").get + 1} state versions")

    spark.stop()
    println("[demo] PIPELINE COMPLETE")
  }
}

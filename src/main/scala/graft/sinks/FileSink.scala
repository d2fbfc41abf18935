package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}

/** File-based output (cda-client FileBasedOutputWriter.scala)
  * re-expressed Spark-first.
  *
  * Layout mirrors the reference: `<root>/<table>/<fingerprint>` plus
  * an optional `/<timestamp>` leaf. `singleFile` does a coalesce(1) —
  * the reference documents the same trade-off (one file vs one file
  * per partition); at scale leave it off and let each task write.
  *
  * CSV can't carry nested structs or binary, so structs are
  * serialized with the codegen'd `to_json` (the reference used a Row
  * UDF, FileBasedOutputWriter.scala:22) and binary becomes base64.
  */
object FileSink {

  case class Layout(root: String, tableName: String, fingerprint: String,
                    timestamp: Option[String] = None) {
    def path: String = {
      val base = s"$root/$tableName/$fingerprint"
      timestamp.map(t => s"$base/$t").getOrElse(base)
    }
  }

  /** Make a DataFrame CSV-safe: structs → JSON strings, binary →
    * base64, and CR/LF runs in strings → a single space (line-split
    * readers run with multiLine off; a quoted embedded newline tears
    * into reject rows on read — lossy by design, newline-bearing text
    * belongs in JSONL/parquet).
    */
  def flattenForCsv(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, field) =>
      field.dataType match {
        case _: StructType => acc.withColumn(field.name, to_json(col(field.name)))
        case BinaryType => acc.withColumn(field.name, base64(col(field.name)))
        case StringType => acc.withColumn(field.name,
          regexp_replace(col(field.name), "[\\r\\n]+", " "))
        case _ => acc
      }
    }

  def writeCsv(df: DataFrame, layout: Layout,
               header: Boolean = true, singleFile: Boolean = false): String = {
    val out = if (singleFile) flattenForCsv(df).coalesce(1) else flattenForCsv(df)
    out.write.option("header", header.toString).mode(SaveMode.Overwrite).csv(layout.path)
    layout.path
  }

  def writeParquet(df: DataFrame, layout: Layout, singleFile: Boolean = false): String = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).parquet(layout.path)
    layout.path
  }

  /** Parquet write with the knobs that matter at scale: directory
    * partitioning (partition pruning on read), compression codec, and
    * a per-file row cap (bounds task output / downstream split size).
    */
  def writeParquetPartitioned(df: DataFrame, layout: Layout,
                              partitionCols: Seq[String],
                              compression: String = "snappy",
                              maxRecordsPerFile: Long = 0L): String = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
    val withCap = if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile.toString) else w
    val withParts = if (partitionCols.nonEmpty)
      withCap.partitionBy(partitionCols: _*) else withCap
    withParts.parquet(layout.path)
    layout.path
  }

  def writeJson(df: DataFrame, layout: Layout, singleFile: Boolean = false): String = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).json(layout.path)
    layout.path
  }
}

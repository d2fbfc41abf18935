package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** Ingestion/export surfaces for the corpus formats beyond parquet:
  * JSON-lines (the lingua franca of published LLM corpora) and ORC
  * (the other splittable columnar format Spark reads natively).
  *
  * Scale rules encoded here rather than left to callers:
  *
  *  - the JSONL schema is REQUIRED — schema inference is a full extra
  *    pass over the data (at 100 TB, a second 100 TB scan before the
  *    first real one);
  *  - malformed lines are never fatal and never silent: PERMISSIVE
  *    parsing routes them to a corrupt-record column, and
  *    [[splitCorrupt]] separates the good rows from an auditable
  *    reject set (web-scale JSONL always has a torn line somewhere —
  *    a job that dies at 99% on one of them, or silently drops it,
  *    is operationally wrong);
  *  - JSONL is line-splittable and ORC stripe-splittable, so both
  *    reads parallelize per input split like the parquet paths.
  */
object CorpusFormats {

  val CorruptCol = "_corrupt_record"

  /** Read a JSONL corpus with an explicit schema; malformed lines
    * surface in [[CorruptCol]] (null for clean rows), carrying the
    * raw line for the reject audit. Parsed as a line-splittable text
    * scan + codegen'd `from_json` rather than the JSON data source:
    * same parallelism, and the reject set stays queryable on its own
    * (the data source forbids plans that touch only its internal
    * corrupt-record column).
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    import org.apache.spark.sql.functions.{from_json, lit, when}
    // the corrupt-record column lives INSIDE the from_json schema:
    // PERMISSIVE from_json yields an all-null row (not a null struct)
    // for a torn line, so struct-nullness alone cannot tell a reject
    // from a record of legitimate nulls
    val withCorrupt = schema.add(CorruptCol, StringType)
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol)
    spark.read.text(path)
      .select(from_json(col("value"), withCorrupt, opts).as("__r"), col("value"))
      .select(schema.fieldNames.map(f => col(s"__r.`$f`")) :+
        when(col("__r").isNull || col(s"__r.`$CorruptCol`").isNotNull,
          col("value")).otherwise(lit(null).cast(StringType))
          .as(CorruptCol): _*)
  }

  /** (clean rows without the corrupt column, reject rows' raw lines). */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col(CorruptCol).isNull).drop(CorruptCol),
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))
  )

  def writeJsonl(df: DataFrame, path: String): String = {
    df.write.mode(SaveMode.Overwrite).json(path)
    path
  }

  /** Read a CSV export with an explicit schema (same
    * no-inference-pass rule as JSONL); malformed rows surface in
    * [[CorruptCol]] carrying the raw line, split out via
    * [[splitCorrupt]]. Quoting/escaping follow the writer's RFC-4180
    * defaults, and `multiLine` stays OFF: quoted embedded newlines
    * would make the file non-line-splittable (one task per FILE at
    * 100 TB) — corpus text with newlines belongs in JSONL/parquet,
    * and the writer path ([[graft.sinks.FileSink]]) flattens them.
    */
  def readCsv(spark: SparkSession, path: String,
              schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    import org.apache.spark.sql.functions.{from_csv, lit, when}
    // text scan + codegen'd from_csv, exactly like readJsonl: the CSV
    // data source forbids plans touching only its internal
    // corrupt-record column, which is precisely what the reject
    // branch of splitCorrupt is. Per-part header lines are dropped by
    // exact match against the writer's header (schema-first contract:
    // a data row spelled identically to the header has no distinct
    // meaning in this format).
    val withCorrupt = schema.add(CorruptCol, StringType)
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol)
    val header = schema.fieldNames.mkString(",")
    spark.read.text(path)
      .filter(col("value") =!= lit(header))
      .select(from_csv(col("value"), withCorrupt, opts).as("__r"), col("value"))
      .select(schema.fieldNames.map(f => col(s"__r.`$f`")) :+
        when(col("__r").isNull || col(s"__r.`$CorruptCol`").isNotNull,
          col("value")).otherwise(lit(null).cast(StringType))
          .as(CorruptCol): _*)
  }

  /** Replace CR/LF runs in string columns with a single space. The
    * reader runs with multiLine OFF (line-splittability at 100 TB), so
    * the writer must never emit a quoted embedded newline its own
    * reader would tear into corrupt reject rows. Lossy by design:
    * corpus text with meaningful newlines belongs in JSONL/parquet.
    */
  def flattenNewlines(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.regexp_replace
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case StringType => acc.withColumn(f.name,
          regexp_replace(col(f.name), "[\\r\\n]+", " "))
        case _ => acc
      }
    }
  }

  def writeCsv(df: DataFrame, path: String): String = {
    flattenNewlines(df).write
      .mode(SaveMode.Overwrite).option("header", "true").csv(path)
    path
  }

  /** Read an XML corpus (one record per `rowTag` element) with an
    * explicit schema (same no-inference-pass rule as JSONL);
    * malformed records surface in [[CorruptCol]] carrying the raw
    * record, split out via [[splitCorrupt]].
    *
    * Same design as [[readJsonl]], NOT the xml datasource: a record
    * scan + codegen'd `from_xml`. The scan uses `</rowTag>` as the
    * text record delimiter — sound because the writer escapes `<>&`
    * in content, so the closing tag cannot occur inside a value —
    * which keeps the read per-split parallel even though records span
    * lines, and keeps the reject set queryable on its own (the
    * datasource forbids plans that touch only its internal
    * corrupt-record column, which is exactly the reject audit).
    * Root-element wrappers and inter-record whitespace are stripped
    * by anchoring each fragment at its first `<rowTag` boundary.
    */
  def readXml(spark: SparkSession, path: String, schema: StructType,
              rowTag: String = "row"): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    import org.apache.spark.sql.functions.{concat, from_xml, lit, regexp_extract, when}
    val close = s"</$rowTag>"
    val anchor = s"(?s)<$rowTag[\\s/>].*"
    val recs = spark.read.option("lineSep", close).text(path)
      .select(regexp_extract(col("value"), anchor, 0).as("__frag"))
      .filter(col("__frag") =!= "")
      .select(concat(col("__frag"), lit(close)).as("__rec"))
    val withCorrupt = schema.add(CorruptCol, StringType)
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol)
    recs
      .select(from_xml(col("__rec"), withCorrupt, opts.asJava).as("__r"),
        col("__rec"))
      .select(schema.fieldNames.map(f => col(s"__r.`$f`")) :+
        when(col("__r").isNull || col(s"__r.`$CorruptCol`").isNotNull,
          col("__rec")).otherwise(lit(null).cast(StringType))
          .as(CorruptCol): _*)
  }

  /** Write as XML, one `rowTag` element per row (nulls omitted as
    * absent elements; `&<>` escaped by the writer — the reader
    * unescapes, so text columns round-trip).
    */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): String = {
    df.write.mode(SaveMode.Overwrite).format("xml")
      .option("rowTag", rowTag).option("rootTag", "rows").save(path)
    path
  }

  /** Write as FIXED-WIDTH text (the mainframe/legacy-feed format):
    * each column rendered to its declared width, left-justified,
    * space-padded; nulls are all-spaces. Two value classes REFUSE
    * inside the writing task (`raise_error`, no extra validation
    * pass) rather than silently corrupting the round-trip:
    *  - a value LONGER than its width — truncation would shift the
    *    column boundary for every field to its right;
    *  - a value with LEADING or TRAILING whitespace — space padding
    *    makes it indistinguishable from the padded form, so the
    *    reader's trim would hand back a different value. Whitespace-
    *    edge strings have no faithful fixed-width encoding; refusing
    *    is the overflow-refusal convention applied to the same
    *    lossiness.
    * Remaining inherent ambiguity (documented, not refused): the
    * empty string renders as all-spaces, identical to null, and
    * reads back as null.
    */
  def writeFixedWidth(df: DataFrame, path: String,
                      widths: Seq[Int]): String = {
    import org.apache.spark.sql.functions.{concat, length, lit, raise_error, rpad, trim, when}
    require(widths.length == df.schema.length,
      s"writeFixedWidth: ${widths.length} widths for ${df.schema.length} columns")
    require(widths.forall(_ > 0), "writeFixedWidth: widths must be positive")
    val fields = df.schema.fields.zip(widths).map { case (f, w) =>
      val s = col(f.name).cast(StringType)
      when(s.isNull, rpad(lit(""), w, " "))
        .when(length(s) > w, raise_error(concat(
          lit(s"writeFixedWidth: value in '${f.name}' exceeds width $w: "), s)))
        .when(s =!= trim(s) && length(s) > 0, raise_error(concat(
          lit(s"writeFixedWidth: value in '${f.name}' has leading/trailing " +
            "whitespace, which space padding cannot round-trip: '"),
          s, lit("'"))))
        .otherwise(rpad(s, w, " "))
    }
    df.select(concat(fields: _*).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    path
  }

  /** Read a fixed-width export with an explicit schema + widths;
    * malformed lines (wrong length, or a non-castable non-blank
    * field) surface in [[CorruptCol]] carrying the raw line for
    * [[splitCorrupt]]. Line-splittable like CSV/JSONL: a plain text
    * scan + substring slices + try-casts, all inside the scan's
    * codegen span.
    */
  def readFixedWidth(spark: SparkSession, path: String,
                     schema: StructType, widths: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.functions.{length, lit, trim, when}
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    require(widths.length == schema.length,
      s"readFixedWidth: ${widths.length} widths for ${schema.length} columns")
    val total = widths.sum
    val starts = widths.scanLeft(1)(_ + _) // 1-based substring offsets
    val sliced = schema.fields.zip(widths).zip(starts).map {
      case ((f, w), off) =>
        val raw = trim(col("value").substr(off, w))
        val blank = raw === ""
        val parsed = when(!blank, raw.try_cast(f.dataType.sql))
        // corrupt iff non-blank but uncastable (try_cast: ANSI mode
        // would otherwise throw mid-scan on one bad byte)
        (parsed.as(f.name), !blank && parsed.isNull)
    }
    val badField = sliced.map(_._2).reduce(_ || _)
    spark.read.text(path)
      .select(sliced.map(_._1) :+
        when(length(col("value")) =!= total || badField, col("value"))
          .otherwise(lit(null).cast(StringType)).as(CorruptCol): _*)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
               compression: String = "zstd"): String = {
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression).orc(path)
    path
  }
}

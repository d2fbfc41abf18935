package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming windowed aggregation over the events stream
  * (SURVEY.md §2a row 18). The batch equivalent (`q_stream_window`)
  * is oracle-checked; StreamingSpec asserts stream == batch.
  */
object WindowedAgg {

  /** File-source schema for the events table; `ts` is declared with
    * whatever physical type the files carry (see [[readEventsStream]]).
    */
  private def eventsRawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the events parquet path as a stream with proper timestamps.
    * A file stream needs its schema up front, and the generator has
    * emitted two shapes across rounds (the same pair TableCatalog
    * .events normalizes batch-side): TIMESTAMP(NANOS) — readable only
    * as a long, converted via `div 1000` — and TIMESTAMP(MICROS)
    * unadjusted-to-UTC, which Spark reads as TIMESTAMP_NTZ and a UTC
    * session casts losslessly to LTZ. One batch-read footer probe of
    * the path picks the branch; applying the nanos `div 1000` to
    * micros data would shear every timestamp by 1000x.
    */
  def readEventsStream(spark: SparkSession, path: String,
                       maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(path).schema("ts").dataType
    val reader = spark.readStream.schema(eventsRawSchema(tsType))
    val withOpt = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val raw = withOpt.parquet(path)
    tsType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling-window counts/sums with a watermark. Works on both
    * streaming and batch DataFrames (same plan text — that is the
    * point of Structured Streaming).
    */
  def tumblingAgg(events: DataFrame, windowLength: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** HOPPING (sliding) windows: each event contributes to
    * size/slide overlapping windows — the streaming twin of the
    * oracle-checked batch form (`q69_hopping_window`); same plan
    * on streaming and batch frames, watermark bounds the state to
    * the lateness horizon × overlap factor.
    */
  def hoppingAgg(events: DataFrame, windowLength: String = "1 hour",
                 slide: String = "15 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength, slide), col("event_type"))
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Run a streaming aggregation to a memory sink until the source is
    * drained; returns the final result as a batch DataFrame.
    */
  def runToMemory(spark: SparkSession, agg: DataFrame, queryName: String): DataFrame = {
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}

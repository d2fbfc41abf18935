package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming windowed aggregation over the events stream
  * (SURVEY.md §2a row 18). The batch equivalent (`q_stream_window`)
  * is oracle-checked; StreamingSpec asserts stream == batch.
  */
object WindowedAgg {

  /** File-source schema for the events table (ts arrives as parquet
    * TIMESTAMP(NANOS) — read as a long and converted, see
    * TableCatalog.events).
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the events parquet path as a stream with proper timestamps. */
  def readEventsStream(spark: SparkSession, path: String,
                       maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val reader = spark.readStream.schema(eventsRawSchema)
    val withOpt = maxFilesPerTrigger.fold(reader)(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    withOpt.parquet(path)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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

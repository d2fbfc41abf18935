package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * Mirrors the role of the reference's per-table parquet fetch
  * (cda-client TableReader.scala:425-433) minus the S3 listing: each
  * logical table is a parquet path under a scale-factor directory.
  * All reads go through `spark.read.parquet` so Catalyst applies
  * filter pushdown / column pruning to every downstream query.
  */
object TableCatalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` normalization. The generator has emitted two parquet
    * shapes across rounds, and every downstream query expects a plain
    * TIMESTAMP (LTZ; sessions run in UTC):
    *  - TIMESTAMP(NANOS), which Spark 4 rejects by default — read as a
    *    nanos long and convert losslessly to a micros timestamp (the
    *    generator emits micro-precision instants; `ts div 1000` drops
    *    only zero digits);
    *  - TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4
    *    infers as TIMESTAMP_NTZ — cast to LTZ (a wall-clock
    *    reinterpretation in the UTC session, so values match the
    *    DuckDB oracle's naive reading). Without this cast every
    *    `unix_micros(ts)` / time-window consumer fails to resolve.
    */
  private def eventsWithTimestamp(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame = eventsWithTimestamp(spark, d)
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}

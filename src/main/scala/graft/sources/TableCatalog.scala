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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default. Read it as a nanos long and convert losslessly to a
    * micros timestamp (the generator emits micro-precision instants;
    * `ts div 1000` drops only zero digits).
    */
  private def eventsWithTimestamp(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
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

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDailySeries

/** Streaming daily-series maintenance: streamed batches == the batch
  * q139/q140 contract queries exactly, replayed-batchId no-op, real
  * foreachBatch stream.
  */
class StreamDailySeriesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    .select(col("o_orderkey"), col("o_orderdate").as("ts"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))

  private def normAcf(df: org.apache.spark.sql.DataFrame) =
    df.as[(Int, Long, Option[Double])].collect().toSet
  private def normMed(df: org.apache.spark.sql.DataFrame) = df
    .select(date_format(col("day"), "yyyy-MM-dd").as("d"),
      col("n_days"), col("med2_cents"))
    .as[(String, Long, Long)].collect().toSet

  test("3 streamed batches == batch q139/q140; replayed batchId is a no-op") {
    val dir = Files.createTempDirectory("sdaily").toString
    (0 until 3).foreach { i =>
      StreamDailySeries.applyBatch(orders.filter($"o_orderkey" % 3 === i),
        "ts", "cents", dir, i.toLong)
    }
    val wantAcf = normAcf(SparkEntry.queries("q139_acf")(spark, sfDir))
    val wantMed = normMed(SparkEntry.queries("q140_rolling_median")(spark, sfDir))
    assert(normAcf(StreamDailySeries.acf(spark, dir)) == wantAcf)
    assert(normMed(StreamDailySeries.rollingMedian(spark, dir)) == wantMed)

    // a replayed (already-committed) batch changes nothing
    StreamDailySeries.applyBatch(orders.filter($"o_orderkey" % 3 === 1),
      "ts", "cents", dir, 1L)
    assert(normAcf(StreamDailySeries.acf(spark, dir)) == wantAcf)

    // the r14b readouts ride the same daily state: live Holt and
    // weekday profile == the batch operators over everything streamed
    val daily = orders.select(to_date(col("ts")).as("day"), col("cents"))
      .groupBy(col("day"))
      .agg(sum(col("cents")).as("rev"))
    def strs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSet
    assert(strs(StreamDailySeries.holt(spark, dir)) ==
      strs(graft.operators.DailySeries.holt(daily)))
    assert(strs(StreamDailySeries.weekdayProfile(spark, dir)) ==
      strs(graft.operators.DailySeries.weekdayProfile(daily)))
  }

  test("real foreachBatch stream == batch") {
    val in = Files.createTempDirectory("sdaily_in").toString
    orders.filter($"o_orderkey" % 2 === 0).write.parquet(s"$in/b1")
    orders.filter($"o_orderkey" % 2 === 1).write.parquet(s"$in/b2")
    val dir = Files.createTempDirectory("sdaily_state").toString
    val q = StreamDailySeries.start(
      spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*"),
      "ts", "cents", dir, Files.createTempDirectory("sdaily_ck").toString)
    q.processAllAvailable(); q.stop()
    assert(normMed(StreamDailySeries.rollingMedian(spark, dir)) ==
      normMed(SparkEntry.queries("q140_rolling_median")(spark, sfDir)))
  }
}

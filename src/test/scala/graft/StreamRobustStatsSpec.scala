package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RobustStats
import graft.streaming.StreamRobustStats

/** Streaming robust stats: streamed batches == batch operator
  * (median/MAD and quantile bands, exact), replayed-batchId no-op,
  * real foreachBatch stream.
  */
class StreamRobustStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = (1L to 60L).map(i => ("g" + (i % 3), i * 7 % 23))

  private def normMad(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long, Long, Long)].collect().toSet
  private def normQ(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long, Long, Long)].collect().toSet

  test("3 streamed batches == batch; replayed batchId is a no-op") {
    val dir = Files.createTempDirectory("srob").toString
    rows.grouped(20).zipWithIndex.foreach { case (b, i) =>
      StreamRobustStats.applyBatch(b.toDF("g", "v"), "g", "v", dir, i.toLong)
    }
    val wantMad = normMad(RobustStats.madSummary(rows.toDF("g", "v"), "g", "v"))
    val wantQ = normQ(RobustStats.quantilesNearestRank(
      rows.toDF("g", "v"), "g", "v", Seq(10, 50, 90)))
    assert(normMad(StreamRobustStats.madSummary(spark, dir)) == wantMad)
    assert(normQ(StreamRobustStats.quantiles(spark, dir, Seq(10, 50, 90))) == wantQ)

    // a replayed (already-committed) batch changes nothing
    StreamRobustStats.applyBatch(rows.take(20).toDF("g", "v"), "g", "v", dir, 1L)
    assert(normMad(StreamRobustStats.madSummary(spark, dir)) == wantMad)
  }

  test("real foreachBatch stream == batch") {
    val in = Files.createTempDirectory("srob_in").toString
    rows.take(30).toDF("g", "v").write.parquet(s"$in/b1")
    rows.drop(30).toDF("g", "v").write.parquet(s"$in/b2")
    val dir = Files.createTempDirectory("srob_state").toString
    val q = StreamRobustStats.start(
      spark.readStream.schema("g STRING, v LONG")
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*"),
      "g", "v", dir, Files.createTempDirectory("srob_ck").toString)
    q.processAllAvailable(); q.stop()
    assert(normMad(StreamRobustStats.madSummary(spark, dir)) ==
      normMad(RobustStats.madSummary(rows.toDF("g", "v"), "g", "v")))
  }
}

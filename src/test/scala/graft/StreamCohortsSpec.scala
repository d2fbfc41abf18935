package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamCohorts

/** Streaming cohort retention: streamed batches == batch q142,
  * late-arriving earlier events re-cohort their user, replayed
  * batchId no-op, real foreachBatch stream.
  */
class StreamCohortsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val events = graft.sources.TableCatalog.events(spark, sfDir)
    .select(col("event_id"), col("user_id"), col("ts"))

  private def norm(df: org.apache.spark.sql.DataFrame) = df
    .select(date_format(col("cohort"), "yyyy-MM-dd").as("c"),
      col("week_offset"), col("n_active"), col("cohort_size"), col("retention"))
    .as[(String, Int, Long, Long, Double)].collect().toSet

  test("3 streamed batches == batch q142; replayed batchId is a no-op") {
    val dir = Files.createTempDirectory("scohort").toString
    (0 until 3).foreach { i =>
      StreamCohorts.applyBatch(events.filter($"event_id" % 3 === i),
        "user_id", "ts", dir, i.toLong)
    }
    val want = norm(SparkEntry.queries("q142_cohort_retention")(spark, sfDir))
    assert(norm(StreamCohorts.retention(spark, dir)) == want && want.nonEmpty)
    StreamCohorts.applyBatch(events.filter($"event_id" % 3 === 1),
      "user_id", "ts", dir, 1L)
    assert(norm(StreamCohorts.retention(spark, dir)) == want)
  }

  test("a late-arriving EARLIER event re-cohorts its user") {
    val dir = Files.createTempDirectory("scohort_late").toString
    val t = java.sql.Timestamp.valueOf(_: String)
    // batch 0: user 1 first seen in week of Jan 8
    StreamCohorts.applyBatch(Seq((1L, t("2024-01-10 00:00:00")))
      .toDF("user_id", "ts"), "user_id", "ts", dir, 0L)
    val before = StreamCohorts.retention(spark, dir)
      .select(date_format($"cohort", "yyyy-MM-dd")).as[String].collect().toSet
    assert(before == Set("2024-01-08"))
    // batch 1: an OLDER event for the same user arrives — cohort must
    // move back to Jan 1's week, and the Jan-10 activity becomes
    // offset 1 of the new cohort
    StreamCohorts.applyBatch(Seq((1L, t("2024-01-02 00:00:00")))
      .toDF("user_id", "ts"), "user_id", "ts", dir, 1L)
    val after = norm(StreamCohorts.retention(spark, dir))
    assert(after == Set(("2024-01-01", 0, 1L, 1L, 1.0),
      ("2024-01-01", 1, 1L, 1L, 1.0)), after.toString)
  }

  test("real foreachBatch stream == batch") {
    val in = Files.createTempDirectory("scohort_in").toString
    events.filter($"event_id" % 2 === 0).write.parquet(s"$in/b1")
    events.filter($"event_id" % 2 === 1).write.parquet(s"$in/b2")
    val dir = Files.createTempDirectory("scohort_state").toString
    val q = StreamCohorts.start(
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*"),
      "user_id", "ts", dir, Files.createTempDirectory("scohort_ck").toString)
    q.processAllAvailable(); q.stop()
    assert(norm(StreamCohorts.retention(spark, dir)) ==
      norm(SparkEntry.queries("q142_cohort_retention")(spark, sfDir)))
  }
}

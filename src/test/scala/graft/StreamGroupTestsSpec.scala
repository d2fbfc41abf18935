package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GroupTests, RankCorr}
import graft.streaming.StreamGroupTests

/** Streaming K-sample battery: streamed batches == batch operators
  * (Kruskal–Wallis, ANOVA, Mood — all three readouts off ONE cell
  * table), replayed-batchId no-op, real foreachBatch stream.
  */
class StreamGroupTestsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // integral sample labels so the SAME streamed cell table also
  // serves the Jonckheere ordered-trend readout
  private val rows = (1L to 90L).map(i =>
    ("f" + (i % 2), i % 3, i * 11 % 31))

  private def norm(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("3 streamed batches == batch for all three tests; replay is a no-op") {
    val dir = Files.createTempDirectory("sgt").toString
    rows.grouped(30).zipWithIndex.foreach { case (b, i) =>
      StreamGroupTests.applyBatch(b.toDF("g", "s", "v"), "g", "s", "v",
        dir, i.toLong)
    }
    val df = rows.toDF("g", "s", "v")
    val wantKw = norm(RankCorr.kruskalWallis(df, "g", "s", "v"))
    val wantAn = norm(GroupTests.anovaOneWay(df, "g", "s", "v"))
    val wantMd = norm(GroupTests.moodMedianTest(df, "g", "s", "v"))
    assert(norm(StreamGroupTests.kruskalWallis(spark, dir, "g")) == wantKw)
    assert(norm(StreamGroupTests.anova(spark, dir, "g")) == wantAn)
    assert(norm(StreamGroupTests.moodMedian(spark, dir, "g")) == wantMd)

    // a replayed (already-committed) batch changes nothing
    StreamGroupTests.applyBatch(rows.take(30).toDF("g", "s", "v"),
      "g", "s", "v", dir, 1L)
    assert(norm(StreamGroupTests.kruskalWallis(spark, dir, "g")) == wantKw)
    assert(norm(StreamGroupTests.anova(spark, dir, "g")) == wantAn)

    // the fourth readout off the SAME cell table: live JT == batch
    assert(norm(StreamGroupTests.jonckheere(spark, dir, "g")) ==
      norm(RankCorr.jonckheereTerpstra(df, "g", "s", "v")))
  }

  test("real foreachBatch stream == batch") {
    val in = Files.createTempDirectory("sgt_in").toString
    rows.take(45).toDF("g", "s", "v").write.parquet(s"$in/b1")
    rows.drop(45).toDF("g", "s", "v").write.parquet(s"$in/b2")
    val dir = Files.createTempDirectory("sgt_state").toString
    val q = StreamGroupTests.start(
      spark.readStream.schema("g STRING, s BIGINT, v LONG")
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*"),
      "g", "s", "v", dir, Files.createTempDirectory("sgt_ck").toString)
    q.processAllAvailable(); q.stop()
    val df = rows.toDF("g", "s", "v")
    assert(norm(StreamGroupTests.kruskalWallis(spark, dir, "g")) ==
      norm(RankCorr.kruskalWallis(df, "g", "s", "v")))
    assert(norm(StreamGroupTests.moodMedian(spark, dir, "g")) ==
      norm(GroupTests.moodMedianTest(df, "g", "s", "v")))
  }
}

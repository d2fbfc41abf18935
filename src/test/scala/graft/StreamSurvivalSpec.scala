package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Survival
import graft.streaming.StreamSurvival

/** Streaming survival maintenance: batched folds == one-shot batch
  * Kaplan–Meier AND log-rank (exact, including the rounded survival),
  * replay guard, real foreachBatch stream.
  */
class StreamSurvivalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val obs = Seq(
    ("A", 1L, 1), ("A", 2L, 0), ("A", 3L, 1), ("A", 4L, 1), ("A", 2L, 1),
    ("B", 1L, 1), ("B", 1L, 1), ("B", 1L, 0), ("B", 2L, 1), ("B", 5L, 0))

  private def kmNorm(df: org.apache.spark.sql.DataFrame) = df
    .as[(String, Long, Long, Long, Double)].collect().toSet
  private def lrNorm(df: org.apache.spark.sql.DataFrame) = df
    .as[(Long, Long, Long, Option[Double])].collect().toSet

  test("3 streamed batches == batch KM and log-rank; replay is a no-op") {
    val dir = Files.createTempDirectory("ssurv").toString
    val batches = Seq(obs.take(4), obs.slice(4, 7), obs.drop(7))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamSurvival.applyBatch(b.toDF("g", "t", "e"), "g", "t", "e",
        dir, i.toLong)
    }
    val wantKm = kmNorm(Survival.kaplanMeier(obs.toDF("g", "t", "e"),
      "g", "t", "e"))
    assert(kmNorm(StreamSurvival.kaplanMeier(spark, dir)) == wantKm &&
      wantKm.nonEmpty)
    val wantLr = lrNorm(Survival.logRank(obs.toDF("g", "t", "e"),
      "g", "t", "e", "A"))
    assert(lrNorm(StreamSurvival.logRank(spark, dir, "A")) == wantLr)
    // additive counts + replay: a redelivered batch id must be
    // skipped whole or it would double-count
    StreamSurvival.applyBatch(batches(2).toDF("g", "t", "e"), "g", "t", "e",
      dir, 2L)
    assert(kmNorm(StreamSurvival.kaplanMeier(spark, dir)) == wantKm)
    assert(lrNorm(StreamSurvival.logRank(spark, dir, "A")) == wantLr)
  }

  test("real foreachBatch stream == batch") {
    val in = Files.createTempDirectory("ssurv_in").toString
    obs.take(5).toDF("g", "t", "e").write.parquet(s"$in/b1")
    obs.drop(5).toDF("g", "t", "e").write.parquet(s"$in/b2")
    val dir = Files.createTempDirectory("ssurv_state").toString
    val q = StreamSurvival.start(
      spark.readStream.schema("g STRING, t LONG, e INT")
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*"),
      "g", "t", "e", dir,
      Files.createTempDirectory("ssurv_ck").toString)
    q.processAllAvailable(); q.stop()
    assert(kmNorm(StreamSurvival.kaplanMeier(spark, dir)) ==
      kmNorm(Survival.kaplanMeier(obs.toDF("g", "t", "e"), "g", "t", "e")))
  }
}

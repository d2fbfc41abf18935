package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ols
import graft.streaming.StreamOls

/** Streaming grouped OLS off the additive exact-integer moment
  * state: streamed batches == batch fitGrouped2 EXACTLY, replay
  * no-op, real foreachBatch stream, the moment-side magnitude
  * refusal.
  */
class StreamOlsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = (1 to 150).map { i =>
    val g = "g" + (i % 2)
    val x1 = (i * 7 % 23).toLong; val x2 = (i * 13 % 11).toLong
    (g, x1, x2, 10L + 3L * x1 - 2L * x2 + (i * 31 % 5).toLong)
  }

  private def norm(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("3 streamed batches == batch fitGrouped2 EXACTLY; replay no-op") {
    val dir = Files.createTempDirectory("sols").toString
    rows.grouped(50).zipWithIndex.foreach { case (b, i) =>
      StreamOls.applyBatch(b.toDF("g", "x1", "x2", "y"),
        "g", "x1", "x2", "y", dir, i.toLong)
    }
    val want = norm(Ols.fitGrouped2(rows.toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y"))
    assert(norm(StreamOls.current(spark, dir, "g")) == want)
    StreamOls.applyBatch(rows.take(50).toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y", dir, 1L)
    assert(norm(StreamOls.current(spark, dir, "g")) == want)
  }

  test("real foreachBatch stream == batch") {
    val in = Files.createTempDirectory("sols_in").toString
    rows.take(75).toDF("g", "x1", "x2", "y").write.parquet(s"$in/b1")
    rows.drop(75).toDF("g", "x1", "x2", "y").write.parquet(s"$in/b2")
    val dir = Files.createTempDirectory("sols_state").toString
    val q = StreamOls.start(
      spark.readStream.schema("g STRING, x1 LONG, x2 LONG, y LONG")
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*"),
      "g", "x1", "x2", "y", dir,
      Files.createTempDirectory("sols_ck").toString)
    q.processAllAvailable(); q.stop()
    assert(norm(StreamOls.current(spark, dir, "g")) ==
      norm(Ols.fitGrouped2(rows.toDF("g", "x1", "x2", "y"),
        "g", "x1", "x2", "y")))
  }

  test("fitFromMoments2 magnitude refusal fires on oversized state") {
    val big = spark.sql(
      "SELECT 'g' AS g, CAST(10 AS DECIMAL(38,0)) AS n, " +
        "CAST('99999999999999999999' AS DECIMAL(38,0)) AS sx1, " +
        "CAST(1 AS DECIMAL(38,0)) AS sx2, " +
        "CAST('9999999999999999999999999999999999999' AS DECIMAL(38,0)) " +
        "AS sx1x1, " +
        "CAST(1 AS DECIMAL(38,0)) AS sx2x2, " +
        "CAST(1 AS DECIMAL(38,0)) AS sx1x2, " +
        "CAST(1 AS DECIMAL(38,0)) AS sy, " +
        "CAST(1 AS DECIMAL(38,0)) AS sx1y, " +
        "CAST(1 AS DECIMAL(38,0)) AS sx2y, " +
        "CAST(1 AS DECIMAL(38,0)) AS syy")
    val e = SparkTestSession.refusalMessage {
      Ols.fitFromMoments2(big, "g").collect()
    }
    assert(e.contains("Cramer"), e)
  }
}

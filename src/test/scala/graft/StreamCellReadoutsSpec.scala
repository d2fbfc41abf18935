package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Benford, GroupTests}
import graft.streaming.{StreamBenford, StreamCramersV}

/** Streaming Benford + Cramér's V readouts off additive count-table
  * state: streamed batches == batch operators, replayed-batchId
  * no-op, real foreachBatch streams.
  */
class StreamCellReadoutsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def norm(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  // multi-scale positive values so several first digits appear
  private val benfordRows = (1L to 120L).map(i => (i * i * 7) % 9973 + 1)

  private val vRows = (1L to 90L).map(i =>
    ("f" + (i % 2), "r" + (i % 3), "c" + (i * 5 % 4)))

  test("Benford: 3 streamed batches == batch; replay is a no-op") {
    val dir = Files.createTempDirectory("sbf").toString
    benfordRows.grouped(40).zipWithIndex.foreach { case (b, i) =>
      StreamBenford.applyBatch(b.toDF("v"), "v", dir, i.toLong)
    }
    val want = norm(Benford.test(benfordRows.toDF("v"), "v"))
    assert(norm(StreamBenford.current(spark, dir)) == want)
    // a replayed (already-committed) batch changes nothing
    StreamBenford.applyBatch(benfordRows.take(40).toDF("v"), "v", dir, 1L)
    assert(norm(StreamBenford.current(spark, dir)) == want)
  }

  test("Cramér's V: 3 streamed batches == batch; replay is a no-op") {
    val dir = Files.createTempDirectory("scv").toString
    vRows.grouped(30).zipWithIndex.foreach { case (b, i) =>
      StreamCramersV.applyBatch(b.toDF("g", "r", "c"), "g", "r", "c",
        dir, i.toLong)
    }
    val df = vRows.toDF("g", "r", "c")
    val want = norm(GroupTests.cramersV(df, "g", "r", "c"))
    assert(norm(StreamCramersV.current(spark, dir, "g")) == want)
    StreamCramersV.applyBatch(vRows.take(30).toDF("g", "r", "c"),
      "g", "r", "c", dir, 0L)
    assert(norm(StreamCramersV.current(spark, dir, "g")) == want)
  }

  test("real foreachBatch streams == batch (both readouts)") {
    val inB = Files.createTempDirectory("sbf_in").toString
    benfordRows.take(60).toDF("v").write.parquet(s"$inB/b1")
    benfordRows.drop(60).toDF("v").write.parquet(s"$inB/b2")
    val dirB = Files.createTempDirectory("sbf_state").toString
    val qB = StreamBenford.start(
      spark.readStream.schema("v LONG")
        .option("maxFilesPerTrigger", "1").parquet(s"$inB/*"),
      "v", dirB, Files.createTempDirectory("sbf_ck").toString)
    qB.processAllAvailable(); qB.stop()
    assert(norm(StreamBenford.current(spark, dirB)) ==
      norm(Benford.test(benfordRows.toDF("v"), "v")))

    val inV = Files.createTempDirectory("scv_in").toString
    vRows.take(45).toDF("g", "r", "c").write.parquet(s"$inV/b1")
    vRows.drop(45).toDF("g", "r", "c").write.parquet(s"$inV/b2")
    val dirV = Files.createTempDirectory("scv_state").toString
    val qV = StreamCramersV.start(
      spark.readStream.schema("g STRING, r STRING, c STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$inV/*"),
      "g", "r", "c", dirV, Files.createTempDirectory("scv_ck").toString)
    qV.processAllAvailable(); qV.stop()
    assert(norm(StreamCramersV.current(spark, dirV, "g")) ==
      norm(GroupTests.cramersV(vRows.toDF("g", "r", "c"), "g", "r", "c")))
  }
}

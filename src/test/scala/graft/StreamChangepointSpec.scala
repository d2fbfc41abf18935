package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamChangepoint

/** Streaming CUSUM == the batch q89 over everything seen, across
  * batches that split days.
  */
class StreamChangepointSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("3-microbatch streamed change-point equals the batch q89 statistic") {
    val work = Files.createTempDirectory("scp")
    val e = graft.sources.TableCatalog.events(spark, sfDir)
      .select($"event_id", $"ts")
    e.filter($"event_id" % 3 === 0).write.parquet(s"$work/in/b=0")
    e.filter($"event_id" % 3 === 1).write.parquet(s"$work/in/b=1")
    e.filter($"event_id" % 3 === 2).write.parquet(s"$work/in/b=2")
    val stream = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamChangepoint.start(stream, s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()

    val got = StreamChangepoint.changepoint(spark, s"$work/state")
      .collect()(0)
    val want = graft.queries.Advanced.q89Changepoint(spark, sfDir)
      .select("change_day", "d_k", "n_days", "total_events")
      .collect()(0)
    assert(got.getDate(0).toString === want.getDate(0).toString)
    assert(got.getLong(1) === want.getLong(1))
    assert(got.getLong(2) === want.getLong(2))
    assert(got.getLong(3) === want.getLong(3))
  }

  test("a redelivered batchId is a no-op: daily counts cannot double") {
    val work = Files.createTempDirectory("scpr")
    val e = graft.sources.TableCatalog.events(spark, sfDir)
      .select($"event_id", $"ts")
    val b0 = e.filter($"event_id" % 2 === 0)
    val b1 = e.filter($"event_id" % 2 === 1)
    StreamChangepoint.applyBatch(b0, s"$work/state", Some(0L))
    StreamChangepoint.applyBatch(b1, s"$work/state", Some(1L))
    def stat() = StreamChangepoint.changepoint(spark, s"$work/state")
      .select("change_day", "d_k", "total_events").collect()(0)
    val before = stat()
    StreamChangepoint.applyBatch(b1, s"$work/state", Some(1L)) // redelivery
    val after = stat()
    assert(after.getDate(0).toString === before.getDate(0).toString)
    assert(after.getLong(1) === before.getLong(1))
    assert(after.getLong(2) === before.getLong(2), "total must not double")
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamHotspots

/** Streaming grid-hotspot maintenance: summed cell-count state == the
  * batch q132 scan; redelivered batchId is a no-op (counts sum).
  */
class StreamHotspotsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  private def points: DataFrame =
    graft.sources.TableCatalog.customer(spark, sfDir).select(
      col("c_custkey"),
      expr("(c_custkey * 2654435761L) % 100000").as("x"),
      expr("(c_custkey * 40503L + 12345) % 100000").as("y"))

  test("3 real streamed microbatches equal the batch hotspot scan") {
    val work = Files.createTempDirectory("shot")
    val p = points
    (0 to 2).foreach { b =>
      p.filter($"c_custkey" % 3 === b).write.parquet(s"$work/in/b=$b")
    }
    val stream = spark.readStream.schema(p.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamHotspots.start(stream, "x", "y", 5000L,
      s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()
    val got = StreamHotspots.hotspots(spark, s"$work/state")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = graft.operators.SpatialJoin.gridHotspots(p, "x", "y", 5000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty && got === want)
  }

  test("redelivered batchId is a no-op: counts cannot double") {
    val work = Files.createTempDirectory("shot-r")
    val p = points
    StreamHotspots.applyBatch(p.filter($"c_custkey" % 2 === 0),
      "x", "y", 5000L, s"$work/state", Some(0L))
    StreamHotspots.applyBatch(p.filter($"c_custkey" % 2 === 1),
      "x", "y", 5000L, s"$work/state", Some(1L))
    def snap() = StreamHotspots.state(spark, s"$work/state")
      .as[(Long, Long, Long)].collect().toSet
    val before = snap()
    StreamHotspots.applyBatch(p.filter($"c_custkey" % 2 === 1),
      "x", "y", 5000L, s"$work/state", Some(1L))
    assert(snap() === before)
  }
}

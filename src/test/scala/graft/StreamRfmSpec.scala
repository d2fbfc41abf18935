package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamRfm

/** Streaming RFM maintenance: folded per-customer partials + on-demand
  * quintile scoring == the batch q115 segmentation; redelivered
  * batchId is a no-op (counts/sums are not replay-idempotent).
  */
class StreamRfmSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("3 real streamed microbatches score exactly like batch q115") {
    val work = Files.createTempDirectory("srfm")
    val o = graft.sources.TableCatalog.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
    (0 to 2).foreach { b =>
      o.filter($"o_orderkey" % 3 === b).write.parquet(s"$work/in/b=$b")
    }
    val stream = spark.readStream.schema(o.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamRfm.start(stream, s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()

    val got = StreamRfm.rfm(spark, s"$work/state")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = graft.queries.Advanced3.q115Rfm(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("a redelivered batchId is a no-op: frequency cannot double") {
    val work = Files.createTempDirectory("srfm-r")
    val o = graft.sources.TableCatalog.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderdate", $"o_totalprice")
    val b0 = o.filter($"o_custkey" % 2 === 0)
    val b1 = o.filter($"o_custkey" % 2 === 1)
    StreamRfm.applyBatch(b0, s"$work/state", Some(0L))
    StreamRfm.applyBatch(b1, s"$work/state", Some(1L))
    def snap() = StreamRfm.state(spark, s"$work/state")
      .select($"cust", $"rec".cast("string"), $"freq", $"mon")
      .as[(Long, String, Long, Long)].collect().toSet
    val before = snap()
    StreamRfm.applyBatch(b1, s"$work/state", Some(1L))
    assert(snap() === before)
    // batch-mode caller (no batchId) always applies
    StreamRfm.applyBatch(b1.limit(1), s"$work/state", None)
    assert(snap() !== before)
  }
}

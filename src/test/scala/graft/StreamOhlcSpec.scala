package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOhlc

/** Streaming OHLC: multi-batch merged bars == the batch q87 result
  * over all events, including batches that SPLIT days (the merge
  * rule's open/close arbitration is what's under test).
  */
class StreamOhlcSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("3-microbatch merged bars equal the batch OHLC, with days split across batches") {
    val work = Files.createTempDirectory("sohlc")
    val e = graft.sources.TableCatalog.events(spark, sfDir)
      .select($"event_id", $"ts", $"value")
    // split by event_id PARITY so nearly every day straddles batches:
    // the merge must pick open/close across batch boundaries
    e.filter($"event_id" % 3 === 0).write.parquet(s"$work/in/b=0")
    e.filter($"event_id" % 3 === 1).write.parquet(s"$work/in/b=1")
    e.filter($"event_id" % 3 === 2).write.parquet(s"$work/in/b=2")
    val stream = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamOhlc.start(stream, s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()

    val got = StreamOhlc.bars(spark, s"$work/state")
      .select("day", "open", "high", "low", "close", "n")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val want = graft.queries.Advanced.q87Ohlc(spark, sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("a redelivered batchId is a no-op: counts cannot double") {
    val work = Files.createTempDirectory("sohlcr")
    val e = graft.sources.TableCatalog.events(spark, sfDir)
      .select($"event_id", $"ts", $"value")
    val b0 = e.filter($"event_id" % 2 === 0)
    val b1 = e.filter($"event_id" % 2 === 1)
    StreamOhlc.applyBatch(b0, s"$work/state", Some(0L))
    StreamOhlc.applyBatch(b1, s"$work/state", Some(1L))
    def bars() = StreamOhlc.bars(spark, s"$work/state")
      .select("day", "open", "high", "low", "close", "n")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val before = bars()
    // at-least-once: a crash between our commit and the engine's
    // commit-log write redelivers batch 1 — counts must NOT sum again
    StreamOhlc.applyBatch(b1, s"$work/state", Some(1L))
    assert(bars() === before)
    // batch-mode callers (no batchId) still always apply
    StreamOhlc.applyBatch(b1, s"$work/state")
    assert(bars() !== before)
  }
}

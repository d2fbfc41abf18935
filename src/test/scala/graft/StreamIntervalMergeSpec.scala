package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalMerge
import graft.streaming.StreamIntervalMerge

/** Streaming islands-and-gaps maintenance: multi-batch folded spans
  * == the batch coalesce over all intervals, a redelivered batchId
  * is a no-op (weights are NOT replay-idempotent by algebra), and
  * the q90 aggregates derived from the maintained state equal the
  * batch q90 query.
  */
class StreamIntervalMergeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  /** The q90 interval set: per order, (cust, orderdate .. max shipdate). */
  private def intervals: DataFrame = {
    val o = graft.sources.TableCatalog.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", to_date($"o_orderdate").as("start_day"))
    val ship = graft.sources.TableCatalog.lineitem(spark, sfDir)
      .groupBy($"l_orderkey").agg(max(to_date($"l_shipdate")).as("end_day"))
    o.join(ship, $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("cust"), $"o_orderkey".as("ok"),
        $"start_day", $"end_day")
  }

  private def spanSet(df: DataFrame): Set[(Long, String, String, Long)] =
    df.select($"cust", $"span_start".cast("string"),
        $"span_end".cast("string"), $"weight")
      .as[(Long, String, String, Long)].collect().toSet

  test("3 real streamed microbatches fold to the batch coalesce; q90 aggregates match") {
    val work = Files.createTempDirectory("simerge")
    val iv = intervals.localCheckpoint(true)
    (0 to 2).foreach { b =>
      iv.filter($"ok" % 3 === b).write.parquet(s"$work/in/b=$b")
    }
    val stream = spark.readStream.schema(iv.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamIntervalMerge.start(stream, "cust", "start_day", "end_day",
      s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()

    val got = spanSet(StreamIntervalMerge.spans(spark, s"$work/state"))
    val want = spanSet(IntervalMerge.coalesce(
      iv.withColumn("w", lit(1L)), "cust", "start_day", "end_day", "w")
      .withColumnRenamed("start_day", "span_start")
      .withColumnRenamed("end_day", "span_end"))
    assert(want.nonEmpty)
    assert(got === want)

    // the maintained state reproduces the batch q90 aggregates exactly
    val agg = StreamIntervalMerge.spans(spark, s"$work/state")
      .groupBy($"cust")
      .agg(count(lit(1)).cast("bigint").as("n_islands"),
        max($"weight").as("busiest_island"),
        sum(datediff($"span_end", $"span_start") + 1)
          .cast("bigint").as("covered_days"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val q90 = graft.queries.Advanced.q90IntervalMerge(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(agg === q90)
  }

  test("a redelivered batchId is a no-op: span weights cannot double") {
    val work = Files.createTempDirectory("simerge-r")
    val iv = intervals.localCheckpoint(true)
    val b0 = iv.filter($"ok" % 2 === 0)
    val b1 = iv.filter($"ok" % 2 === 1)
    StreamIntervalMerge.applyBatch(b0, "cust", "start_day", "end_day",
      s"$work/state", Some(0L))
    StreamIntervalMerge.applyBatch(b1, "cust", "start_day", "end_day",
      s"$work/state", Some(1L))
    val before = spanSet(StreamIntervalMerge.spans(spark, s"$work/state"))
    // at-least-once: crash between our commit and the engine's commit
    // log redelivers batch 1 — weights must NOT sum again
    StreamIntervalMerge.applyBatch(b1, "cust", "start_day", "end_day",
      s"$work/state", Some(1L))
    val after = spanSet(StreamIntervalMerge.spans(spark, s"$work/state"))
    assert(after === before)
    // but a batch-mode caller (no batchId) always applies
    StreamIntervalMerge.applyBatch(b1.limit(1), "cust", "start_day", "end_day",
      s"$work/state", None)
    val applied = spanSet(StreamIntervalMerge.spans(spark, s"$work/state"))
    assert(applied !== before)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDrawdown

/** Streaming max-drawdown: monotonic time-ordered batches fold to
  * exactly the batch q122 result; an out-of-order batch REFUSES
  * (drawdown is order-dependent — no silent wrong fold); a
  * redelivered batchId is a no-op.
  */
class StreamDrawdownSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  private def events = graft.sources.TableCatalog.events(spark, sfDir)
    .select($"user_id", $"ts", $"event_id", $"value")

  /** Split all events into 3 strictly time-ordered slices. */
  private def slices: Seq[org.apache.spark.sql.DataFrame] = {
    val bounds = events.select(
      expr("percentile(unix_micros(ts), 0.34)").cast("long"),
      expr("percentile(unix_micros(ts), 0.67)").cast("long"))
      .as[(Long, Long)].collect()(0)
    Seq(
      events.filter(unix_micros($"ts") < bounds._1),
      events.filter(unix_micros($"ts") >= bounds._1 &&
        unix_micros($"ts") < bounds._2),
      events.filter(unix_micros($"ts") >= bounds._2))
  }

  private def snap(dir: String) =
    StreamDrawdown.drawdown(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("3 time-ordered batches == batch q122 exactly") {
    val work = Files.createTempDirectory("sdd")
    slices.zipWithIndex.foreach { case (df, i) =>
      StreamDrawdown.applyBatch(df, s"$work/state", Some(i.toLong))
    }
    val got = snap(s"$work/state")
    val want = graft.queries.Advanced3.q122Drawdown(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("an out-of-order batch refuses; a redelivered batchId is a no-op") {
    val work = Files.createTempDirectory("sdd-r")
    val Seq(b0, b1, _) = slices
    StreamDrawdown.applyBatch(b0, s"$work/state", Some(0L))
    StreamDrawdown.applyBatch(b1, s"$work/state", Some(1L))
    val before = snap(s"$work/state")
    // replayed batchId: skipped, state unchanged
    StreamDrawdown.applyBatch(b1, s"$work/state", Some(1L))
    assert(snap(s"$work/state") === before)
    // batch-mode replay of already-folded data violates the
    // monotonic-append contract and must refuse loudly
    val e = intercept[IllegalArgumentException] {
      StreamDrawdown.applyBatch(b1, s"$work/state", None)
    }
    assert(e.getMessage.contains("order"))
    assert(snap(s"$work/state") === before) // state intact after refusal
  }

  test("real foreachBatch stream over time-partitioned files == batch") {
    val work = Files.createTempDirectory("sdd-s")
    slices.zipWithIndex.foreach { case (df, i) =>
      df.coalesce(1).write.parquet(s"$work/in/b=$i")
    }
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(s"$work/in/*")
    val q = StreamDrawdown.start(stream, s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()
    val want = graft.queries.Advanced3.q122Drawdown(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(snap(s"$work/state") === want)
  }
}

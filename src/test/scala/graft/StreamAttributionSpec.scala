package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamAttribution
import graft.streaming.StreamAttribution.TouchEvent

/** Streaming attribution == the batch q75 window semantics, across
  * microbatch boundaries, with per-purchase (not per-group) rows.
  */
class StreamAttributionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  /** Per-purchase batch reference: the q75 windows before grouping. */
  private def batchReference = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when($"event_type".isin("click", "view"), $"event_type")
    graft.sources.TableCatalog.events(spark, sfDir)
      .withColumn("ft", first(touch, ignoreNulls = true).over(w))
      .withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id",
        coalesce($"ft", lit("none")).as("first_touch"),
        coalesce($"lt", lit("none")).as("last_touch"))
  }

  test("streaming attribution equals batch windows across 3 time-split microbatches") {
    val work = Files.createTempDirectory("sattr")
    val e = graft.sources.TableCatalog.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
    // time-ordered delivery: three files split on EVENT TIME (the
    // delivery contract the fold assumes), so a purchase and its
    // earlier touches can land in different triggers
    val us = unix_micros($"ts")
    val cuts = e.withColumn("us", us).stat
      .approxQuantile("us", Array(0.33, 0.66), 0.0)
    e.filter(us <= cuts(0)).write.parquet(s"$work/in/t=0")
    e.filter(us > cuts(0) && us <= cuts(1)).write.parquet(s"$work/in/t=1")
    e.filter(us > cuts(1)).write.parquet(s"$work/in/t=2")

    val stream = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
      .as[TouchEvent]
    val q = StreamAttribution.attribute(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sattr_out")
      .option("checkpointLocation", s"$work/ck").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("sattr_out")
      .select("user_id", "event_id", "first_touch", "last_touch")
      .as[(Long, Long, String, String)].collect().toSet
    val want = batchReference
      .as[(Long, Long, String, String)].collect().toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("events split by event time: batch boundary cannot change attribution") {
    // event_id order == ts order in the generator? Not assumed: the
    // spec above splits on event_id but folds sort on (ts, event_id);
    // here a crafted out-of-order WITHIN one trigger still resolves
    val rows = Seq(
      TouchEvent(1L, 3L, new java.sql.Timestamp(3000L), "purchase", 5.0),
      TouchEvent(1L, 1L, new java.sql.Timestamp(1000L), "view", 0.0),
      TouchEvent(1L, 2L, new java.sql.Timestamp(2000L), "click", 0.0),
      TouchEvent(2L, 4L, new java.sql.Timestamp(1000L), "purchase", 1.0))
    val work = Files.createTempDirectory("sattr2")
    rows.toDS().write.parquet(s"$work/in/t=0")
    val stream = spark.readStream
      .schema(rows.toDS().schema)
      .parquet(s"$work/in/*").as[TouchEvent]
    val q = StreamAttribution.attribute(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sattr2_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sattr2_out")
      .select("event_id", "first_touch", "last_touch")
      .as[(Long, String, String)].collect().toSet
    assert(got === Set((3L, "view", "click"), (4L, "none", "none")))
  }
}

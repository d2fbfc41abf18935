package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamGapFill

/** Streaming gap fill == batch q35 under day-ordered batches; replay
  * idempotent; state stays bucket-incremental (BucketedCdcState).
  */
class StreamGapFillSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("two day-ordered batches == batch gap fill; replay reproduces the increment") {
    val work = Files.createTempDirectory("sgapfill").toString
    val e = graft.sources.TableCatalog.events(spark, sf)
    val midDay = e.agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
      .select(date_add(col("d0"), (datediff(col("d1"), col("d0")) / 2).cast("int")))
      .head().getDate(0)
    val b1 = e.filter(to_date(col("ts")) <= lit(midDay))
    val b2 = e.filter(to_date(col("ts")) > lit(midDay))

    StreamGapFill.applyBatch(b1, "user_id", "ts", "value",
      s"$work/out", s"$work/state", 0L)
    StreamGapFill.applyBatch(b2, "user_id", "ts", "value",
      s"$work/out", s"$work/state", 1L)

    def streamed = StreamGapFill.results(spark, s"$work/out")
      .select("user_id", "day", "value_filled")
      .as[(Long, java.sql.Date, Double)].collect().toSet
    val batch = graft.queries.Relational.q35GapFill(spark, sf)
      .as[(Long, java.sql.Date, Double)].collect().toSet
    val got = streamed
    assert(got == batch && got.nonEmpty)
    // no duplicate (key, day) across increments
    assert(got.size == got.map(t => (t._1, t._2)).size)

    // replayed micro-batch overwrites its own increment: union unchanged
    StreamGapFill.applyBatch(b2, "user_id", "ts", "value",
      s"$work/out", s"$work/state", 1L)
    assert(streamed == batch)
  }

  test("double replay then next batch: prune keeps the anchors, output stays exact") {
    val work = Files.createTempDirectory("sgapfill3").toString
    def b(rows: (Long, String, Double)*) = rows
      .map { case (k, d, v) => (k, java.sql.Timestamp.valueOf(d + " 10:00:00"), v) }
      .toDF("user_id", "ts", "value")
    def apply(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamGapFill.applyBatch(df, "user_id", "ts", "value",
        s"$work/out", s"$work/state", id)
    val b1 = b((1L, "2024-02-01", 1.0), (1L, "2024-02-03", 3.0))
    val b2 = b((1L, "2024-02-06", 6.0))
    val b3 = b((1L, "2024-02-08", 8.0))
    apply(b1, 0L)
    apply(b2, 1L); apply(b2, 1L); apply(b2, 1L) // two replays after the original
    apply(b3, 2L)
    val got = StreamGapFill.results(spark, s"$work/out")
      .select("day", "value_filled").as[(java.sql.Date, Double)]
      .collect().sortBy(_._1.toString).toSeq
    assert(got.map(_._2) == Seq(1.0, 1.0, 3.0, 3.0, 3.0, 6.0, 6.0, 8.0),
      got.mkString(","))
    assert(got.map(_._1.toString) == (1 to 8).map(d => f"2024-02-0$d%d"))
  }

  test("consecutive batches sharing a day: larger value corrects the emission deterministically") {
    val work = Files.createTempDirectory("sgapshare").toString
    def b(rows: (Long, String, Double)*) = rows
      .map { case (k, d, v) => (k, java.sql.Timestamp.valueOf(d + " 10:00:00"), v) }
      .toDF("user_id", "ts", "value")
    def apply(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamGapFill.applyBatch(df, "user_id", "ts", "value",
        s"$work/out", s"$work/state", id)
    apply(b((1L, "2024-03-01", 5.0), (1L, "2024-03-02", 2.0)), 0L)
    // day 03-02 arrives again with a LARGER value (several
    // micro-batches covering one day) plus a later day
    apply(b((1L, "2024-03-02", 9.0), (1L, "2024-03-05", 1.0)), 1L)

    def got = StreamGapFill.results(spark, s"$work/out")
      .select("day", "value_filled").as[(java.sql.Date, Double)]
      .collect().sortBy(_._1.toString).toSeq
    // q35 max-per-day semantics over the union: 5, max(2,9)=9, LOCF 9,9, then 1
    assert(got.map(_._1.toString) == (1 to 5).map(d => s"2024-03-0$d"))
    assert(got.map(_._2) == Seq(5.0, 9.0, 9.0, 9.0, 1.0), got.mkString(","))
    // no duplicate (key, day) rows despite the correction
    assert(got.size == got.map(_._1).distinct.size)

    // replaying the correcting batch changes nothing
    apply(b((1L, "2024-03-02", 9.0), (1L, "2024-03-05", 1.0)), 1L)
    assert(got.map(_._2) == Seq(5.0, 9.0, 9.0, 9.0, 1.0))
  }

  test("consecutive batches sharing a day: smaller value leaves the emission alone") {
    val work = Files.createTempDirectory("sgapshare2").toString
    def b(rows: (Long, String, Double)*) = rows
      .map { case (k, d, v) => (k, java.sql.Timestamp.valueOf(d + " 10:00:00"), v) }
      .toDF("user_id", "ts", "value")
    def apply(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamGapFill.applyBatch(df, "user_id", "ts", "value",
        s"$work/out", s"$work/state", id)
    apply(b((1L, "2024-03-01", 5.0), (1L, "2024-03-02", 2.0)), 0L)
    apply(b((1L, "2024-03-02", 1.0), (1L, "2024-03-05", 7.0)), 1L)
    val got = StreamGapFill.results(spark, s"$work/out")
      .select("day", "value_filled").as[(java.sql.Date, Double)]
      .collect().sortBy(_._1.toString).toSeq
    // day 2 keeps its already-emitted max (2.0); the fill forward
    // carries 2.0 to the next point
    assert(got.map(_._2) == Seq(5.0, 2.0, 2.0, 2.0, 7.0), got.mkString(","))
    assert(got.size == got.map(_._1).distinct.size)
  }

  test("out-of-order day across batches is EXACT: settled intermediate spans keep their value") {
    val work = Files.createTempDirectory("sgapooo").toString
    def b(rows: (Long, String, Double)*) = rows
      .map { case (k, d, v) => (k, java.sql.Timestamp.valueOf(d + " 10:00:00"), v) }
      .toDF("user_id", "ts", "value")
    def apply(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamGapFill.applyBatch(df, "user_id", "ts", "value",
        s"$work/out", s"$work/state", id)
    apply(b((1L, "2024-04-07", 7.0)), 0L)   // emits {7}
    apply(b((1L, "2024-04-10", 10.0)), 1L)  // closes 7's span: {8,9}=7.0, {10}
    // a LATE day between two already-emitted points: it must fill only
    // up to its true next neighbor (day 7); days 8-9, emitted from the
    // intermediate point, must keep 7.0 — the case the old last-point
    // state overwrote
    apply(b((1L, "2024-04-03", 3.0)), 2L)
    def got = StreamGapFill.results(spark, s"$work/out")
      .select("day", "value_filled").as[(java.sql.Date, Double)]
      .collect().sortBy(_._1.toString).toSeq
    assert(got.map(_._1.toString) == (3 to 10).map(d => f"2024-04-$d%02d"))
    assert(got.map(_._2) == Seq(3.0, 3.0, 3.0, 3.0, 7.0, 7.0, 7.0, 10.0),
      got.mkString(","))
    // == the batch gap fill over the union of all arrivals (q35 rule)
    // and replaying the late batch changes nothing
    apply(b((1L, "2024-04-03", 3.0)), 2L)
    assert(got.map(_._2) == Seq(3.0, 3.0, 3.0, 3.0, 7.0, 7.0, 7.0, 10.0))
    // a fourth, in-order batch still closes the newest span only
    apply(b((1L, "2024-04-12", 12.0)), 3L)
    assert(got.map(_._2) == Seq(3.0, 3.0, 3.0, 3.0, 7.0, 7.0, 7.0, 10.0, 10.0, 12.0))
  }

  test("a straggler older than the lateness horizon degrades to the approximate fill") {
    val work = Files.createTempDirectory("sgaphorizon").toString
    def b(rows: (Long, String, Double)*) = rows
      .map { case (k, d, v) => (k, java.sql.Timestamp.valueOf(d + " 10:00:00"), v) }
      .toDF("user_id", "ts", "value")
    def apply(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamGapFill.applyBatch(df, "user_id", "ts", "value",
        s"$work/out", s"$work/state", id, latenessHorizonDays = 2)
    apply(b((1L, "2024-04-07", 7.0)), 0L)
    apply(b((1L, "2024-04-10", 10.0)), 1L) // trims day 7 (3 days behind > 2)
    apply(b((1L, "2024-04-03", 3.0)), 2L)  // beyond the horizon
    val got = StreamGapFill.results(spark, s"$work/out")
      .select("day", "value_filled").as[(java.sql.Date, Double)]
      .collect().sortBy(_._1.toString).toSeq
    // day 7's point is outside the retained window, so the late fill
    // runs to the next RETAINED point (day 10) — the documented
    // latest-wins-approximate degradation, pinned here
    assert(got.map(_._2) == Seq(3.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0, 10.0),
      got.mkString(","))
  }

  test("output consolidation bounds the dir count, preserves results, and keeps replay exact") {
    val work = Files.createTempDirectory("sgapcompact").toString
    def b(rows: (Long, String, Double)*) = rows
      .map { case (k, d, v) => (k, java.sql.Timestamp.valueOf(d + " 10:00:00"), v) }
      .toDF("user_id", "ts", "value")
    def apply(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamGapFill.applyBatch(df, "user_id", "ts", "value",
        s"$work/out", s"$work/state", id, compactEvery = 2)
    // batch 1 corrects batch 0's day — the correction must survive
    // being folded into a compact dir
    apply(b((1L, "2024-04-01", 5.0), (1L, "2024-04-02", 2.0)), 0L)
    apply(b((1L, "2024-04-02", 9.0)), 1L)
    apply(b((1L, "2024-04-04", 4.0)), 2L) // triggers consolidate(<2)
    apply(b((1L, "2024-04-06", 6.0)), 3L)
    apply(b((1L, "2024-04-08", 8.0)), 4L) // triggers consolidate(<4)

    val dir = new java.io.File(s"$work/out")
    val names = dir.listFiles().map(_.getName).filterNot(_.startsWith("_")).sorted.toSeq
    assert(names == Seq("batch_4", "compact_3"), names.mkString(","))

    def got = StreamGapFill.results(spark, s"$work/out")
      .select("day", "value_filled").as[(java.sql.Date, Double)]
      .collect().sortBy(_._1.toString).toSeq
    assert(got.map(_._2) == Seq(5.0, 9.0, 9.0, 4.0, 4.0, 6.0, 6.0, 8.0),
      got.mkString(","))
    assert(got.map(_._1.toString) == (1 to 8).map(d => s"2024-04-0$d"))

    // a replay of the newest batch post-consolidation reproduces its
    // exact increment (state anchor + overwrite of its own dir)
    apply(b((1L, "2024-04-08", 8.0)), 4L)
    assert(got.map(_._2) == Seq(5.0, 9.0, 9.0, 4.0, 4.0, 6.0, 6.0, 8.0))
  }

  test("per-day consolidation: untouched day partitions are not rewritten; results stay exact") {
    val work = Files.createTempDirectory("sgapdaily").toString
    def b(rows: (Long, String, Double)*) = rows
      .map { case (k, d, v) => (k, java.sql.Timestamp.valueOf(d + " 10:00:00"), v) }
      .toDF("user_id", "ts", "value")
    def apply(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamGapFill.applyBatch(df, "user_id", "ts", "value",
        s"$work/out", s"$work/state", id, compactEvery = 2,
        perDayCompaction = true)
    apply(b((1L, "2024-04-01", 5.0), (1L, "2024-04-02", 2.0)), 0L)
    apply(b((1L, "2024-04-02", 9.0)), 1L)
    apply(b((1L, "2024-04-04", 4.0)), 2L) // consolidate(<2): days 01-02

    val out = new java.io.File(s"$work/out")
    def entries = out.listFiles().map(_.getName)
      .filterNot(_.startsWith("_")).sorted.toSeq
    assert(entries == Seq("batch_2", "parts"), entries.mkString(","))
    val partsDir = new java.io.File(s"$work/out/parts")
    def dayDirs = partsDir.listFiles().map(_.getName)
      .filter(_.startsWith("day=")).sorted.toSeq
    assert(dayDirs == Seq("day=2024-04-01", "day=2024-04-02"),
      dayDirs.mkString(","))
    // fingerprint a consolidated day: parquet file names are unique per
    // write job, so identical names+mtimes prove the partition dir was
    // not rewritten by later consolidations
    def sig(day: String) = new java.io.File(partsDir, day).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified)).sorted.toSeq
    val day1Sig = sig("day=2024-04-01")
    assert(day1Sig.nonEmpty)

    apply(b((1L, "2024-04-06", 6.0)), 3L)
    apply(b((1L, "2024-04-08", 8.0)), 4L) // consolidate(<4): days 03-06 only

    assert(dayDirs == (1 to 6).map(d => s"day=2024-04-0$d"),
      dayDirs.mkString(","))
    assert(sig("day=2024-04-01") == day1Sig,
      "an untouched day partition was rewritten — per-compact I/O is no " +
        "longer bounded by the touched window")
    // dir-count bound: the flat listing holds exactly the live batch
    // dirs plus one parts subtree — no growing compact chain
    assert(entries == Seq("batch_4", "parts"), entries.mkString(","))

    def got = StreamGapFill.results(spark, s"$work/out")
      .select("day", "value_filled").as[(java.sql.Date, Double)]
      .collect().sortBy(_._1.toString).toSeq
    assert(got.map(_._2) == Seq(5.0, 9.0, 9.0, 4.0, 4.0, 6.0, 6.0, 8.0),
      got.mkString(","))
    assert(got.map(_._1.toString) == (1 to 8).map(d => s"2024-04-0$d"))

    // a replay of the newest batch post-consolidation reproduces its
    // exact increment against the per-day layout too
    apply(b((1L, "2024-04-08", 8.0)), 4L)
    assert(got.map(_._2) == Seq(5.0, 9.0, 9.0, 4.0, 4.0, 6.0, 6.0, 8.0))

    // a late correction to an already-consolidated day must win the
    // next consolidation (higher batch id) and rewrite ONLY its day
    apply(b((1L, "2024-04-02", 11.0)), 5L)
    apply(b((1L, "2024-04-09", 1.0)), 6L) // consolidate(<6): days 02-04 (fill 03), 07-08
    assert(sig("day=2024-04-01") == day1Sig,
      "day=01 rewritten by a correction that touched only day 02+")
    assert(got.map(_._2) == Seq(5.0, 11.0, 11.0, 4.0, 4.0, 6.0, 6.0, 8.0, 1.0),
      got.mkString(","))
  }

  test("a key absent from a later batch is not extended past its own last day") {
    val work = Files.createTempDirectory("sgapfill2").toString
    val b1 = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-04 10:00:00"), 7.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val b2 = Seq( // only key 2 continues
      (2L, java.sql.Timestamp.valueOf("2024-01-06 10:00:00"), 2.0)
    ).toDF("user_id", "ts", "value")
    StreamGapFill.applyBatch(b1, "user_id", "ts", "value",
      s"$work/out", s"$work/state", 0L)
    StreamGapFill.applyBatch(b2, "user_id", "ts", "value",
      s"$work/out", s"$work/state", 1L)
    val got = StreamGapFill.results(spark, s"$work/out")
      .select("user_id", "day", "value_filled")
      .as[(Long, java.sql.Date, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.toString)).toMap
    // key 1: 01-01..01-04 LOCF 5,5,5,7 — nothing past 01-04
    assert(got(1L).map(_._3).toSeq == Seq(5.0, 5.0, 5.0, 7.0))
    assert(got(1L).last._2.toString == "2024-01-04")
    // key 2: 01-02 then filled 01-03..01-05 with 1.0, then 01-06 with 2.0
    assert(got(2L).map(_._3).toSeq == Seq(1.0, 1.0, 1.0, 1.0, 2.0))
  }
}

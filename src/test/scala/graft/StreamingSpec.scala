package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcColumns, CdcMerge}
import graft.streaming.{CdcStream, WindowedAgg}

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("streaming tumbling-window agg equals the batch result") {
    // the file stream source needs a directory, not a bare file
    val streamDir = Files.createTempDirectory("evstream")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = WindowedAgg.readEventsStream(spark, streamDir.toString)
    val agg = WindowedAgg.tumblingAgg(stream, "1 hour", "2 hours")
    val got = WindowedAgg.runToMemory(spark, agg, "win_test")
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    val batch = graft.sources.TableCatalog.events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet

    assert(got.nonEmpty)
    assert(got == batch)
  }

  test("streaming hopping-window agg equals the batch sliding windows") {
    val streamDir = Files.createTempDirectory("evhop")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = WindowedAgg.readEventsStream(spark, streamDir.toString)
    val got = WindowedAgg.runToMemory(spark,
        WindowedAgg.hoppingAgg(stream, "1 hour", "15 minutes", "2 hours"),
        "hop_test")
      .select($"window_start", $"event_type", $"n_events", $"sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    // same operator over the batch frame (structured streaming's
    // whole point: one plan, two execution modes)
    val batch = WindowedAgg.hoppingAgg(
        graft.sources.TableCatalog.events(spark, sfDir),
        "1 hour", "15 minutes", "2 hours")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(got.nonEmpty && got == batch)
    // overlap factor: ~4x the tumbling row count for the same data
    val tumbling = WindowedAgg.tumblingAgg(
      graft.sources.TableCatalog.events(spark, sfDir), "1 hour", "2 hours")
    assert(got.size > tumbling.count() * 3)
  }

  test("streaming dedup emits re-delivered records exactly once") {
    val work = Files.createTempDirectory("sdedup")
    val e = graft.sources.TableCatalog.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"ts").limit(200)
    // the same batch lands twice (at-least-once delivery)
    e.write.parquet(s"$work/in/copy=1")
    e.write.parquet(s"$work/in/copy=2")
    val stream = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val deduped = graft.streaming.StreamDedup.dedupUnbounded(stream, Seq("event_id"))
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("sdedup_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sdedup_out")
    assert(got.count() == 200)
    assert(got.select("event_id").distinct().count() == 200)
  }

  test("streaming decontamination equals the batch decontaminate, replays idempotently") {
    val work = Files.createTempDirectory("sdecon")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val probes = docs.filter($"doc_id" % 97 === 0)
      .select($"doc_id".as("probe_id"), $"text")
    // the corpus arrives as three files = three microbatches
    docs.filter($"doc_id" % 3 === 0).write.parquet(s"$work/in/part=0")
    docs.filter($"doc_id" % 3 === 1).write.parquet(s"$work/in/part=1")
    docs.filter($"doc_id" % 3 === 2).write.parquet(s"$work/in/part=2")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = graft.streaming.StreamDecontaminate.start(stream, probes,
      "doc_id", "text", s"$work/out", s"$work/ck", maxFraction = 0.5)
    q.processAllAvailable(); q.stop()

    val streamed = graft.streaming.StreamDecontaminate.survivors(spark, s"$work/out")
      .select("doc_id").as[Long].collect().toSet
    val batch = graft.operators.Decontaminate
      .decontaminate(docs, probes, "doc_id", "text", maxFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch)
    assert(streamed.size < 500, "probe members must be dropped")

    // a replayed microbatch overwrites its own directory, not appends
    val before = graft.streaming.StreamDecontaminate.survivors(spark, s"$work/out").count()
    graft.operators.Decontaminate
      .decontaminateAgainst(docs.filter($"doc_id" % 3 === 0),
        graft.operators.Decontaminate.probeSet(probes, "text"),
        "doc_id", "text", maxFraction = 0.5)
      .write.mode("overwrite").parquet(s"$work/out/batch_0")
    assert(graft.streaming.StreamDecontaminate.survivors(spark, s"$work/out").count() == before)
  }

  test("streaming line dedup: id-ordered stream == batch operator; replay idempotent") {
    val work = Files.createTempDirectory("slinededup")
    val docs = Seq(
      (1L, "alpha\nshared\nbeta"),
      (2L, "shared\ngamma"),
      (3L, "shared\ndelta"),
      (4L, "gamma\nepsilon")).toDF("id", "text")
    // two id-ordered microbatches: cross-batch dedup must drop
    // 'shared' from doc 3 and 'gamma' from doc 4
    docs.filter($"id" <= 2).coalesce(1).write.parquet(s"$work/in/b=1")
    docs.filter($"id" > 2).coalesce(1).write.parquet(s"$work/in/b=2")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = graft.streaming.StreamLineDedup.start(stream, "id", "text",
      s"$work/out", s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()

    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "clean_text", "n_kept", "n_dropped")
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val streamed = collect(graft.streaming.StreamLineDedup.results(spark, s"$work/out"))
    val batch = collect(graft.operators.LineDedup.dedupLines(docs, "id", "text"))
    assert(streamed == batch)
    assert(streamed.find(_._1 == 4L).get._2 == "epsilon") // cross-batch drop

    // a replayed microbatch regenerates identical output and state
    graft.streaming.StreamLineDedup.applyBatch(docs.filter($"id" <= 2),
      "id", "text", "\n", s"$work/out", s"$work/state", 0L)
    assert(collect(graft.streaming.StreamLineDedup.results(spark, s"$work/out")) == streamed)
  }

  test("streaming line dedup: long stream consolidates state, output unchanged, replay safe") {
    val work = Files.createTempDirectory("slinecompact")
    val docs = (1L to 28L).map(i =>
      (i, s"l$i\nshared${i % 5}\ncommon")).toDF("id", "text")
    // 14 microbatches of 2 docs, consolidation every 4 batches
    val K = 4
    (0L until 14L).foreach { b =>
      graft.streaming.StreamLineDedup.applyBatch(
        docs.filter($"id" > b * 2 && $"id" <= (b + 1) * 2),
        "id", "text", "\n", s"$work/out", s"$work/state", b, compactEvery = K)
    }
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "clean_text", "n_kept", "n_dropped")
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val streamed = collect(graft.streaming.StreamLineDedup.results(spark, s"$work/out"))
    assert(streamed == collect(graft.operators.LineDedup.dedupLines(docs, "id", "text")))

    // state stays bounded: the prior-hash read unions the compacted
    // segment + the post-compaction tail (never one segment per batch
    // forever), and pruned version dirs don't accumulate
    def stateSegments = graft.streaming.VersionedDeltaState
      .segmentsBefore(spark, s"$work/state", 14L)
    def stateVersionDirs = new java.io.File(s"$work/state").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.matches("v\\d+")).sorted.toSeq
    assert(stateSegments.size <= K, stateSegments.mkString(","))
    assert(stateVersionDirs.size <= 2 * K, stateVersionDirs.mkString(","))
    // the OUTPUT side consolidates on the same cadence
    def outDirNames = new java.io.File(s"$work/out").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(outDirNames.count(_.startsWith("batch_")) <= K)
    // tiered consolidation: the newest compact covers up to batch 11
    // (its name may carry a floor suffix), older tiers may remain
    assert(outDirNames.exists(_.startsWith("compact_11")), outDirNames.mkString(","))

    // replay the consolidating batch (12) and the tail batch (13):
    // identical output, consolidation skip path exercised
    Seq(12L, 13L).foreach { b =>
      graft.streaming.StreamLineDedup.applyBatch(
        docs.filter($"id" > b * 2 && $"id" <= (b + 1) * 2),
        "id", "text", "\n", s"$work/out", s"$work/state", b, compactEvery = K)
    }
    assert(collect(graft.streaming.StreamLineDedup.results(spark, s"$work/out")) == streamed)
    // the replayed batches' superseded commits don't widen the read set
    assert(graft.streaming.VersionedDeltaState
      .segmentsBefore(spark, s"$work/state", 14L).size <= K)
  }

  test("stream-stream join: matches cross microbatch boundaries, bounds respected") {
    import graft.streaming.StreamStreamJoin
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // replay splits at mid event time (4000s here). The view at 1900s
    // lands in batch 1, its matching purchase at 4001s in batch 2 —
    // that match must come from buffered join state.
    val events = Seq(
      (1L, 10L, "view", ts(0)),        // 4001s gap: outside the 1h window
      (1L, 11L, "view", ts(1900)),     // batch 1, matches purchase 21 across batches
      (1L, 21L, "purchase", ts(4001)),
      (1L, 12L, "view", ts(4100)),     // after purchase 21: no backward match
      (2L, 13L, "view", ts(4200)),
      (2L, 22L, "purchase", ts(4300)), // same-batch match
      (3L, 23L, "purchase", ts(8000))  // user with no views
    ).toDF("user_id", "event_id", "event_type", "ts")

    val got = StreamStreamJoin.replayPurchaseViews(spark, events, 3600L)
      .select($"p_id", $"v_id").as[(Long, Long)].collect().toSet
    assert(got == Set((21L, 11L), (22L, 13L)),
      s"expected the cross-batch and same-batch matches only, got $got")
  }

  test("continuous CDC merge converges to sequence-ordered latest state") {
    val work = Files.createTempDirectory("cdcstream")
    val inDir = s"$work/in"; val stateDir = s"$work/state"; val ckDir = s"$work/ck"
    Files.createDirectories(java.nio.file.Paths.get(inDir))

    // coded op-log fixture: 3 entities; entity 2 ends deleted, entity 3
    // is deleted then re-inserted LATER in sequence (stream semantics:
    // latest op wins, so it survives — unlike the intra-batch
    // deletes-last semantics of CdcMerge.applyOperations)
    val log = Seq(
      (1L, 1L, 2, "a1"), (1L, 4L, 4, "a2"),
      (2L, 2L, 2, "b1"), (2L, 5L, 1, null),
      (3L, 3L, 1, null), (3L, 6L, 2, "c1"))
      .toDF("id", "seq", CdcColumns.OperationCol, "v")

    // two micro-batches split by sequence
    log.filter($"seq" <= 3).write.parquet(s"$inDir/batch=1")
    log.filter($"seq" > 3).write.parquet(s"$inDir/batch=2")

    val stream = spark.readStream.schema(log.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*")
    val q = CdcStream.start(stream, stateDir, Seq("id"), Seq("seq"), ckDir)
    q.processAllAvailable()
    q.stop()

    assert(CdcStream.currentVersion(spark, stateDir).exists(_ >= 1), "should commit >1 state version")
    val state = CdcStream.currentState(spark, stateDir).get
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(state == Map(1L -> "a2", 3L -> "c1"))

    // tombstone retained for entity 2
    val withTombstones = CdcStream.stateWithTombstones(spark, stateDir).get
    assert(withTombstones.count() == 3)

    // equivalence: same result as a one-shot batch compaction of the full log
    val batchState = CdcMerge.latestByKey(log, Seq("id"), Seq("seq"))
      .filter(col(CdcColumns.OperationCol) =!= CdcMerge.DeleteOp)
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(state == batchState)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamNearDedup

/** Streaming near-duplicate dedup: first-arrival-wins across
  * microbatches, partition-pruned state reads, replay idempotence,
  * bounded state dirs.
  */
class StreamNearDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** ~80-token deterministic text; `mutate` swaps one mid-token so
    * near-dups sit at Jaccard ≈ 0.93, well over the 0.8 threshold.
    */
  private def text(seed: Int, mutate: Boolean = false): String = {
    val toks = (0 until 80).map(i => s"w${seed}_${(i * 7 + seed) % 40}")
    val t = if (mutate) toks.updated(37, "mutated") else toks
    t.mkString(" ")
  }

  private def docs = Seq(
    (1L, text(1)),                 // batch 0: kept (first)
    (2L, text(1, mutate = true)),  // batch 0: near-dup of 1 → dropped
    (3L, text(3)),                 // batch 0: kept
    (4L, text(1)),                 // batch 1: exact dup of 1 → dropped
    (5L, text(5)),                 // batch 1: kept
    (6L, text(5, mutate = true)),  // batch 1: within-batch near-dup of 5 → dropped
    (7L, text(3, mutate = true))   // batch 1: cross-batch near-dup of 3 → dropped
  ).toDF("doc_id", "text")

  test("stream drops within-batch and cross-batch near-dups; replay idempotent") {
    val work = Files.createTempDirectory("sneardedup").toString
    val d = docs
    d.filter($"doc_id" <= 3).coalesce(1).write.parquet(s"$work/in/b=1")
    d.filter($"doc_id" > 3).coalesce(1).write.parquet(s"$work/in/b=2")
    val stream = spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamNearDedup.start(stream, "doc_id", "text",
      s"$work/out", s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()

    def surviving: Seq[Long] = StreamNearDedup.results(spark, s"$work/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(surviving == Seq(1L, 3L, 5L))

    // state holds survivors only (dropped docs add no postings)
    val stateDocs = StreamNearDedup.priorPostings(spark, s"$work/state", 2L,
        (0 until StreamNearDedup.DefaultStateBuckets).toSeq).get
      .select("doc").distinct().as[Long].collect().sorted.toSeq
    assert(stateDocs == Seq(1L, 3L, 5L))

    // replayed microbatch reproduces identical output and state
    StreamNearDedup.applyBatch(d.filter($"doc_id" > 3), "doc_id", "text",
      s"$work/out", s"$work/state", 1L)
    assert(surviving == Seq(1L, 3L, 5L))
  }

  test("prior-state read is partition-pruned to the touched buckets") {
    val work = Files.createTempDirectory("sneardedupprune").toString
    val d = docs
    StreamNearDedup.applyBatch(d.filter($"doc_id" <= 3), "doc_id", "text",
      s"$work/out", s"$work/state", 0L)
    // probe with a single bucket id that exists in state: the pruned
    // read must plan a partition filter and return only that bucket
    // (batch 0's delta committed as version 0 of the state chain)
    val one = new java.io.File(s"$work/state/v0/seg").listFiles()
      .map(_.getName).filter(_.startsWith("bkt=")).map(_.stripPrefix("bkt=").toInt)
      .min
    val prior = StreamNearDedup.priorPostings(spark, s"$work/state", 1L, Seq(one)).get
    val plan = prior.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bkt"),
      s"no partition pruning:\n$plan")
    assert(prior.select("bkt").distinct().as[Int].collect().toSeq == Seq(one))
  }

  test("degenerate identical-doc batch: over-cap buckets skipped, under cap they dedup") {
    val work = Files.createTempDirectory("sneardedupcap").toString
    val same = (1L to 50L).map(i => (i, text(9))).toDF("doc_id", "text")
    // cap below the bucket population: every band bucket is skipped,
    // nothing goes quadratic, nothing is dropped (exact dedup's job)
    StreamNearDedup.applyBatch(same, "doc_id", "text",
      s"$work/out_capped", s"$work/state_capped", 0L, maxBucketSize = 10)
    assert(spark.read.parquet(s"$work/out_capped/batch_0").count() == 50L)
    // default cap admits the buckets: one survivor
    StreamNearDedup.applyBatch(same, "doc_id", "text",
      s"$work/out", s"$work/state", 0L)
    assert(spark.read.parquet(s"$work/out/batch_0").count() == 1L)
  }

  test("long stream consolidates state dirs; dedup vs compacted state still works") {
    val work = Files.createTempDirectory("sneardedupcompact").toString
    // 6 batches of one fresh doc each, then a 7th batch duplicating doc 0
    (0 until 6).foreach { i =>
      Seq((100L + i, text(100 + i))).toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$work/tmp_$i")
      StreamNearDedup.applyBatch(spark.read.parquet(s"$work/tmp_$i"),
        "doc_id", "text", s"$work/out", s"$work/state", i, compactEvery = 2)
    }
    // state reads stay bounded: the segment list visible to the next
    // batch holds the consolidated segment plus the post-compaction
    // tail, never one segment per batch forever — and prune keeps the
    // version-dir count bounded too
    val segs = graft.streaming.VersionedDeltaState
      .segmentsBefore(spark, s"$work/state", 6L)
    assert(segs.size <= 3, segs.mkString(","))
    val versionDirs = new java.io.File(s"$work/state").listFiles()
      .map(_.getName).filter(_.startsWith("v")).sorted
    assert(versionDirs.size <= 6, versionDirs.mkString(","))
    // the OUTPUT side consolidates on the same cadence
    val outDirs = new java.io.File(s"$work/out").listFiles().map(_.getName)
      .filter(n => n.startsWith("batch_") || n.startsWith("compact_")).sorted
    assert(outDirs.count(_.startsWith("batch_")) <= 2, outDirs.mkString(","))
    assert(outDirs.exists(_.startsWith("compact_")), outDirs.mkString(","))

    Seq((200L, text(100))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$work/tmp_dup")
    StreamNearDedup.applyBatch(spark.read.parquet(s"$work/tmp_dup"),
      "doc_id", "text", s"$work/out", s"$work/state", 6L, compactEvery = 2)
    val kept = StreamNearDedup.results(spark, s"$work/out")
      .select("doc_id").as[Long].collect().toSeq
    assert(!kept.contains(200L), "dup of consolidated doc 100 must be dropped")
    assert(kept.sorted == (100L to 105L), kept.sorted.mkString(","))

    // replayed consolidation (same covered id) is a no-op that keeps state intact
    StreamNearDedup.consolidate(spark, s"$work/state", 6L)
    val docs6 = StreamNearDedup.priorPostings(spark, s"$work/state", 7L,
      (0 until StreamNearDedup.DefaultStateBuckets).toSeq).get
      .select("doc").distinct().count()
    assert(docs6 == 6L)
  }
}

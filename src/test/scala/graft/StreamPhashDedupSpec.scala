package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.streaming.StreamPhashDedup

/** Streaming perceptual-hash image dedup: first-arrival-wins across
  * microbatches, undecodables kept, replay idempotent, versioned
  * state bounded.
  */
class StreamPhashDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // class = id % 4: docs sharing a class render near-identical images
  private def img(id: Long) = Multimodal.syntheticPpm(id, classes = 4)

  test("stream drops within-batch and cross-batch near-dup images; replay idempotent") {
    val work = Files.createTempDirectory("sphash").toString
    // batch 0: ids 0,1,2 (classes 0,1,2) — all kept
    // batch 1: 4 (cls 0 → cross-batch drop), 5 (cls 1 → drop),
    //          7 (cls 3 → fresh, kept), 11 (cls 3 → within-batch drop),
    //          90 (undecodable → kept)
    val b0 = Seq(0L, 1L, 2L).map(id => (id, img(id))).toDF("doc_id", "payload")
    val b1 = (Seq(4L, 5L, 7L, 11L).map(id => (id, img(id))) :+
      (90L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    def apply(df: org.apache.spark.sql.DataFrame, id: Long) =
      StreamPhashDedup.applyBatch(df, "doc_id", "payload",
        s"$work/out", s"$work/state", id)
    apply(b0, 0L); apply(b1, 1L)
    def surviving = StreamPhashDedup.results(spark, s"$work/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(surviving == Seq(0L, 1L, 2L, 7L, 90L))

    // replayed microbatch reproduces identical output and state: it
    // anchors to the pre-batch snapshot, not its own postings
    apply(b1, 1L)
    assert(surviving == Seq(0L, 1L, 2L, 7L, 90L))
    // ...and a third batch still dedups against the replayed state
    apply(Seq((20L, img(7L + 4L * 3))).toDF("doc_id", "payload"), 2L) // cls 3
    assert(surviving == Seq(0L, 1L, 2L, 7L, 90L))
  }

  test("long stream consolidates state segments and prunes versions") {
    val work = Files.createTempDirectory("sphashcompact").toString
    // 8 single-image batches, each a fresh class (classes = 100 so
    // nothing collides), consolidation every 2 batches
    (0L until 8L).foreach { b =>
      val df = Seq((b, Multimodal.syntheticPpm(b, classes = 100)))
        .toDF("doc_id", "payload")
      StreamPhashDedup.applyBatch(df, "doc_id", "payload",
        s"$work/out", s"$work/state", b, compactEvery = 2)
    }
    assert(StreamPhashDedup.results(spark, s"$work/out").count() == 8L)
    val segs = graft.streaming.VersionedDeltaState
      .segmentsBefore(spark, s"$work/state", 8L)
    assert(segs.size <= 3, segs.mkString(","))
    // a duplicate of the first image is still caught via compacted state
    StreamPhashDedup.applyBatch(
      Seq((300L, Multimodal.syntheticPpm(0L + 100L, classes = 100)))
        .toDF("doc_id", "payload"),
      "doc_id", "payload", s"$work/out", s"$work/state", 8L, compactEvery = 2)
    assert(!StreamPhashDedup.results(spark, s"$work/out")
      .select("doc_id").as[Long].collect().contains(300L))
  }
}

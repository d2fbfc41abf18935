package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps
import graft.streaming.StreamTriangles

/** Streaming incremental triangle maintenance: multi-batch running
  * count == one-shot batch count over the union; replays and
  * duplicate edges are no-ops; state commits are append-only
  * O(|batch|) — untouched segment files survive byte-identical.
  */
class StreamTrianglesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def randomEdges(seed: Int, n: Int, nodes: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => (rnd.nextInt(nodes).toLong + 1,
      rnd.nextInt(nodes).toLong + 1)).filter(e => e._1 != e._2)
  }

  /** All data-file (path, mtime) pairs under the state root. */
  private def dataFileStamps(root: String): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.Map.empty[String, Long]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        buf += f.getPath.toString -> f.getModificationTime
    }
    buf.toMap
  }

  test("3-batch incremental count equals the one-shot triangle count") {
    val work = Files.createTempDirectory("stri")
    val b1 = randomEdges(1, 300, 30)
    val b2 = randomEdges(2, 300, 30)
    val b3 = randomEdges(3, 300, 30)
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      StreamTriangles.applyBatch(b.toDF("a", "b"), "a", "b",
        s"$work/state", batchId = i.toLong)
    }
    val (nE, nT) = StreamTriangles.counts(spark, s"$work/state")
    val want = GraphOps.triangleCount((b1 ++ b2 ++ b3).toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect()(0)
    assert(nT > 0, "test graph should contain triangles")
    assert((nE, nT) === ((want._2, want._3)))
  }

  test("replayed and duplicate edges are no-ops") {
    val work = Files.createTempDirectory("strir")
    val b1 = randomEdges(7, 200, 25)
    val b2 = randomEdges(8, 200, 25)
    StreamTriangles.applyBatch(b1.toDF("a", "b"), "a", "b",
      s"$work/state", batchId = 0L)
    StreamTriangles.applyBatch(b2.toDF("a", "b"), "a", "b",
      s"$work/state", batchId = 1L)
    val before = StreamTriangles.counts(spark, s"$work/state")
    // at-least-once redelivery of batch 1: anchors to the same
    // pre-batch snapshot its first attempt saw, re-derives the same
    // delta and count, supersedes instead of double-counting
    StreamTriangles.applyBatch(b2.toDF("a", "b"), "a", "b",
      s"$work/state", batchId = 1L)
    assert(StreamTriangles.counts(spark, s"$work/state") === before)
    // reversed duplicates under a NEW batch id canonicalize to
    // already-present edges: zero new edges, count unchanged
    StreamTriangles.applyBatch(b2.map(e => (e._2, e._1)).toDF("a", "b"),
      "a", "b", s"$work/state", batchId = 2L)
    assert(StreamTriangles.counts(spark, s"$work/state") === before)
  }

  test("a fold appends O(|batch|): pre-existing state files survive byte-identical") {
    val work = Files.createTempDirectory("strib")
    StreamTriangles.applyBatch(randomEdges(21, 400, 40).toDF("a", "b"),
      "a", "b", s"$work/state", batchId = 0L)
    val before = dataFileStamps(s"$work/state")
    assert(before.nonEmpty)
    StreamTriangles.applyBatch(randomEdges(22, 50, 40).toDF("a", "b"),
      "a", "b", s"$work/state", batchId = 1L)
    val after = dataFileStamps(s"$work/state")
    // the BucketedCdcState convention: every v0 file survives in
    // place (same path, same mtime) — the commit wrote only the
    // batch's own delta, never the full edge list
    before.foreach { case (path, mtime) =>
      assert(after.contains(path), s"pre-existing state file deleted: $path")
      assert(after(path) == mtime, s"pre-existing state file rewritten: $path")
    }
    assert((after.keySet -- before.keySet).nonEmpty)
  }

  test("consolidation merges segments, keeps counts, and replays still no-op") {
    val work = Files.createTempDirectory("stric")
    val batches = (0 until 5).map(i => randomEdges(30 + i, 120, 22))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamTriangles.applyBatch(b.toDF("a", "b"), "a", "b",
        s"$work/state", batchId = i.toLong, compactEvery = 2)
    }
    val (nE, nT) = StreamTriangles.counts(spark, s"$work/state")
    val want = GraphOps.triangleCount(batches.flatten.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect()(0)
    assert((nE, nT) === ((want._2, want._3)))
    // state reads stay bounded: segments visible to the next batch
    // are at most compactEvery + 1
    assert(graft.streaming.VersionedDeltaState
      .segmentsBefore(spark, s"$work/state", 5L).size <= 3)
    // replay of the last batch after consolidation
    StreamTriangles.applyBatch(batches.last.toDF("a", "b"), "a", "b",
      s"$work/state", batchId = 4L, compactEvery = 2)
    assert(StreamTriangles.counts(spark, s"$work/state") === ((nE, nT)))
  }

  test("real stream via foreachBatch matches the batch count") {
    val work = Files.createTempDirectory("stris")
    val batches = Seq(randomEdges(11, 250, 28), randomEdges(12, 250, 28))
    batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF("a", "b").write.parquet(s"$work/in/b=$i")
    }
    val schema = batches.head.toDF("a", "b").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamTriangles.start(stream, "a", "b", s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()
    val (nE, nT) = StreamTriangles.counts(spark, s"$work/state")
    val want = GraphOps.triangleCount(
      batches.flatten.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect()(0)
    assert((nE, nT) === ((want._2, want._3)))
  }
}

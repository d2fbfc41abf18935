package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps
import graft.streaming.StreamModularity

/** Streaming modularity maintenance: batched folds == one-shot batch
  * operator (exact, including the rounded contribution), replay
  * no-op, missing-endpoint refusal, append-only O(|batch|) commits,
  * real foreachBatch stream.
  */
class StreamModularitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two triangles + bridge + an isolated-node community
  private val allEdges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
  private lazy val assign = Seq((1L, "a"), (2L, "a"), (3L, "a"),
    (4L, "b"), (5L, "b"), (6L, "b"), (99L, "empty")).toDF("node", "community")

  private def norm(df: org.apache.spark.sql.DataFrame) = df
    .select($"community", $"n_nodes", $"e_in", $"deg_sum", $"q_contrib")
    .as[(String, Long, Long, Long, Option[Double])].collect().toSet

  test("3 streamed batches == one-shot batch modularity; replay is a no-op") {
    val dir = Files.createTempDirectory("smod").toString
    val batches = Seq(allEdges.take(3), allEdges.slice(3, 5), allEdges.drop(5))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamModularity.applyBatch(b.toDF("a", "b"), "a", "b",
        assign, "node", "community", dir, batchId = i.toLong)
    }
    val got = norm(StreamModularity.report(spark, dir, assign, "node", "community"))
    val want = norm(GraphOps.modularity(allEdges.toDF("a", "b"), "a", "b",
      assign, "node", "community"))
    assert(got == want && got.nonEmpty, s"got $got want $want")
    // the empty community is visible with zero mass
    assert(got.exists(r => r._1 == "empty" && r._3 == 0L && r._4 == 0L))

    // at-least-once redelivery of the LATEST batch (the only batch a
    // checkpointed stream ever re-runs): anchors to its first
    // attempt's pre-batch snapshot, re-derives the same stats,
    // supersedes — same report
    StreamModularity.applyBatch(
      batches(2).toDF("a", "b"), "a", "b",
      assign, "node", "community", dir, batchId = 2L)
    assert(norm(StreamModularity.report(spark, dir, assign,
      "node", "community")) == got)
    // reversed duplicates under a NEW batch id: zero new edges
    StreamModularity.applyBatch(
      batches(1).map(_.swap).toDF("a", "b"), "a", "b",
      assign, "node", "community", dir, batchId = 3L)
    assert(norm(StreamModularity.report(spark, dir, assign,
      "node", "community")) == got)
  }

  test("a fold appends O(|batch|): pre-existing state files survive byte-identical") {
    val dir = Files.createTempDirectory("smodb").toString
    def stamps: Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.Map.empty[String, Long]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
            f.getPath.toString.contains("/seg/"))
          buf += f.getPath.toString -> f.getModificationTime
      }
      buf.toMap
    }
    StreamModularity.applyBatch(allEdges.take(5).toDF("a", "b"), "a", "b",
      assign, "node", "community", dir, batchId = 0L)
    val before = stamps
    assert(before.nonEmpty)
    StreamModularity.applyBatch(allEdges.drop(5).toDF("a", "b"), "a", "b",
      assign, "node", "community", dir, batchId = 1L)
    val after = stamps
    // the commit wrote only the batch's own edge delta, never the
    // full edge list (the BucketedCdcState byte-identity convention)
    before.foreach { case (path, mtime) =>
      assert(after.contains(path), s"pre-existing state file deleted: $path")
      assert(after(path) == mtime, s"pre-existing state file rewritten: $path")
    }
    assert((after.keySet -- before.keySet).nonEmpty)
  }

  test("consolidation keeps the report exact") {
    val dir = Files.createTempDirectory("smodc").toString
    val batches = Seq(allEdges.take(2), allEdges.slice(2, 4),
      allEdges.slice(4, 6), allEdges.drop(6))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamModularity.applyBatch(b.toDF("a", "b"), "a", "b",
        assign, "node", "community", dir, batchId = i.toLong,
        compactEvery = 2)
    }
    val got = norm(StreamModularity.report(spark, dir, assign,
      "node", "community"))
    val want = norm(GraphOps.modularity(allEdges.toDF("a", "b"), "a", "b",
      assign, "node", "community"))
    assert(got == want)
  }

  test("an edge endpoint missing from the assignment refuses") {
    val dir = Files.createTempDirectory("smod_ref").toString
    val e = intercept[IllegalArgumentException] {
      StreamModularity.applyBatch(Seq((1L, 77L)).toDF("a", "b"), "a", "b",
        assign, "node", "community", dir, batchId = 0L)
    }
    assert(e.getMessage.contains("missing from the assignment"))
  }

  test("real foreachBatch stream == batch") {
    val in = Files.createTempDirectory("smod_in").toString
    allEdges.take(4).toDF("a", "b").write.parquet(s"$in/b1")
    allEdges.drop(4).toDF("a", "b").write.parquet(s"$in/b2")
    val dir = Files.createTempDirectory("smod_state").toString
    val q = StreamModularity.start(
      spark.readStream.schema("a LONG, b LONG")
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*"),
      "a", "b", assign, "node", "community",
      dir, Files.createTempDirectory("smod_ck").toString)
    q.processAllAvailable(); q.stop()
    val got = norm(StreamModularity.report(spark, dir, assign, "node", "community"))
    val want = norm(GraphOps.modularity(allEdges.toDF("a", "b"), "a", "b",
      assign, "node", "community"))
    assert(got == want)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps
import graft.streaming.StreamModularity

/** Streaming modularity maintenance: batched folds == one-shot batch
  * operator (exact, including the rounded contribution), replay
  * no-op, missing-endpoint refusal, real foreachBatch stream.
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
    batches.foreach { b =>
      StreamModularity.applyBatch(b.toDF("a", "b"), "a", "b",
        assign, "node", "community", dir)
    }
    val got = norm(StreamModularity.report(spark, dir, assign, "node", "community"))
    val want = norm(GraphOps.modularity(allEdges.toDF("a", "b"), "a", "b",
      assign, "node", "community"))
    assert(got == want && got.nonEmpty, s"got $got want $want")
    // the empty community is visible with zero mass
    assert(got.exists(r => r._1 == "empty" && r._3 == 0L && r._4 == 0L))

    // replayed + reversed-duplicate batch: zero new edges, same report
    StreamModularity.applyBatch(
      batches(1).map(_.swap).toDF("a", "b"), "a", "b",
      assign, "node", "community", dir)
    assert(norm(StreamModularity.report(spark, dir, assign,
      "node", "community")) == got)
  }

  test("an edge endpoint missing from the assignment refuses") {
    val dir = Files.createTempDirectory("smod_ref").toString
    val e = intercept[IllegalArgumentException] {
      StreamModularity.applyBatch(Seq((1L, 77L)).toDF("a", "b"), "a", "b",
        assign, "node", "community", dir)
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

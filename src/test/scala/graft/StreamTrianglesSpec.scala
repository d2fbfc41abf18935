package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps
import graft.streaming.StreamTriangles

/** Streaming incremental triangle maintenance: multi-batch running
  * count == one-shot batch count over the union; replays and
  * duplicate edges are no-ops by the new-edge anti-join.
  */
class StreamTrianglesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def randomEdges(seed: Int, n: Int, nodes: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => (rnd.nextInt(nodes).toLong + 1,
      rnd.nextInt(nodes).toLong + 1)).filter(e => e._1 != e._2)
  }

  test("3-batch incremental count equals the one-shot triangle count") {
    val work = Files.createTempDirectory("stri")
    val b1 = randomEdges(1, 300, 30)
    val b2 = randomEdges(2, 300, 30)
    val b3 = randomEdges(3, 300, 30)
    Seq(b1, b2, b3).foreach { b =>
      StreamTriangles.applyBatch(b.toDF("a", "b"), "a", "b", s"$work/state")
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
    StreamTriangles.applyBatch(b1.toDF("a", "b"), "a", "b", s"$work/state")
    StreamTriangles.applyBatch(b2.toDF("a", "b"), "a", "b", s"$work/state")
    val before = StreamTriangles.counts(spark, s"$work/state")
    // at-least-once redelivery of batch 1: every edge already in state
    StreamTriangles.applyBatch(b1.toDF("a", "b"), "a", "b", s"$work/state")
    assert(StreamTriangles.counts(spark, s"$work/state") === before)
    // reversed duplicates canonicalize to already-present edges too
    StreamTriangles.applyBatch(b2.map(e => (e._2, e._1)).toDF("a", "b"),
      "a", "b", s"$work/state")
    assert(StreamTriangles.counts(spark, s"$work/state") === before)
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

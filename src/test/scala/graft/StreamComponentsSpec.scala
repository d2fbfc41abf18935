package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components
import graft.streaming.StreamComponents

/** Streaming incremental connected components: multi-batch labelling
  * == one-shot batch labelling over the union; late edges MERGE
  * existing components; replays are no-ops by algebra.
  */
class StreamComponentsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def labelSet(dir: String) =
    StreamComponents.labels(spark, dir)
      .as[(Long, Long)].collect().toSet

  test("3-batch incremental labelling equals the one-shot labelling") {
    val work = Files.createTempDirectory("scmp")
    val rnd = new scala.util.Random(5)
    val batches = (1 to 3).map(_ => (1 to 150).map(_ =>
      (rnd.nextInt(60).toLong + 1, rnd.nextInt(60).toLong + 1))
      .filter(e => e._1 != e._2))
    batches.foreach(b =>
      StreamComponents.applyBatch(b.toDF("a", "b"), "a", "b", s"$work/state"))
    val want = Components.connectedComponents(
        batches.flatten.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(labelSet(s"$work/state") === want)
  }

  test("a bridging edge merges two established components") {
    val work = Files.createTempDirectory("scmpm")
    StreamComponents.applyBatch(
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)).toDF("a", "b"),
      "a", "b", s"$work/state")
    assert(labelSet(s"$work/state") === Set((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L)))
    StreamComponents.applyBatch(Seq((3L, 10L)).toDF("a", "b"),
      "a", "b", s"$work/state")
    assert(labelSet(s"$work/state") ===
      Set(1L, 2L, 3L, 10L, 11L, 12L).map(_ -> 1L))
  }

  test("replayed batch is a no-op by algebra") {
    val work = Files.createTempDirectory("scmpr")
    val b1 = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val b2 = Seq((2L, 3L), (5L, 6L)).toDF("a", "b")
    StreamComponents.applyBatch(b1, "a", "b", s"$work/state")
    StreamComponents.applyBatch(b2, "a", "b", s"$work/state")
    val before = labelSet(s"$work/state")
    StreamComponents.applyBatch(b1, "a", "b", s"$work/state") // redelivery
    assert(labelSet(s"$work/state") === before)
  }

  test("real stream via foreachBatch matches the batch labelling") {
    val work = Files.createTempDirectory("scmps")
    val rnd = new scala.util.Random(9)
    val batches = (1 to 2).map(_ => (1 to 120).map(_ =>
      (rnd.nextInt(40).toLong + 1, rnd.nextInt(40).toLong + 1))
      .filter(e => e._1 != e._2))
    batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF("a", "b").write.parquet(s"$work/in/b=$i")
    }
    val stream = spark.readStream
      .schema(batches.head.toDF("a", "b").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamComponents.start(stream, "a", "b",
      s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()
    val want = Components.connectedComponents(
        batches.flatten.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(labelSet(s"$work/state") === want)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline
import graft.streaming.StreamSkyline

/** Streaming skyline: multi-batch frontier == one-shot batch skyline;
  * replayed batches are no-ops by algebra (insert idempotence).
  */
class StreamSkylineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def points(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => ((seed * 10000 + i).toLong,
      (rnd.nextInt(1000) + 1).toLong, (rnd.nextInt(1000) + 1).toLong))
  }

  test("3-microbatch streamed frontier equals the one-shot batch skyline") {
    val work = Files.createTempDirectory("ssky")
    val batches = Seq(points(1, 400), points(2, 400), points(3, 400))
    batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF("id", "x", "y").write.parquet(s"$work/in/b=$i")
    }
    val schema = batches.head.toDF("id", "x", "y").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamSkyline.start(stream, "x", "y", "id",
      s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()

    val streamed = StreamSkyline.frontier(spark, s"$work/state")
      .select("id").as[Long].collect().toSet
    val full = Skyline.pareto2d(
      batches.flatten.toDF("id", "x", "y"), "x", "y", col("id"))
      .select("id").as[Long].collect().toSet
    assert(full.nonEmpty)
    assert(streamed === full)
  }

  test("a replayed microbatch cannot change the frontier (insert idempotence)") {
    val work = Files.createTempDirectory("ssky2")
    val b0 = points(7, 300).toDF("id", "x", "y")
    val b1 = points(8, 300).toDF("id", "x", "y")
    StreamSkyline.applyBatch(b0, "x", "y", "id", s"$work/state")
    StreamSkyline.applyBatch(b1, "x", "y", "id", s"$work/state")
    val before = StreamSkyline.frontier(spark, s"$work/state")
      .select("id").as[Long].collect().toSet
    // at-least-once delivery: batch 0 lands again
    StreamSkyline.applyBatch(b0, "x", "y", "id", s"$work/state")
    val after = StreamSkyline.frontier(spark, s"$work/state")
      .select("id").as[Long].collect().toSet
    assert(after === before)
  }
}

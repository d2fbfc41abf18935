package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling
import graft.streaming.StreamReservoir

/** Streaming weighted reservoir == the batch A-ES sample over
  * everything seen (deterministic keys make this an equality, not a
  * distribution test); replays are no-ops.
  */
class StreamReservoirSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, (i % 13) + 1))

  test("3-microbatch streamed reservoir equals the one-shot batch sample") {
    val work = Files.createTempDirectory("sres")
    val batches = Seq(rows(0, 400), rows(400, 800), rows(800, 1200))
    batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF("id", "w").write.parquet(s"$work/in/b=$i")
    }
    val schema = batches.head.toDF("id", "w").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamReservoir.start(stream, "id", "w", k = 50,
      s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()

    val streamed = StreamReservoir.reservoir(spark, s"$work/state")
      .select("id").as[Long].collect().toSet
    val batch = Sampling.weightedSample(
        batches.flatten.toDF("id", "w"), "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(batch.size === 50)
    assert(streamed === batch)
  }

  test("a re-delivered microbatch cannot change the reservoir") {
    val work = Files.createTempDirectory("sres2")
    val b0 = rows(0, 300).toDF("id", "w")
    val b1 = rows(300, 600).toDF("id", "w")
    StreamReservoir.applyBatch(b0, "id", "w", 40, s"$work/state")
    StreamReservoir.applyBatch(b1, "id", "w", 40, s"$work/state")
    val before = StreamReservoir.reservoir(spark, s"$work/state")
      .select("id").as[Long].collect().toSet
    StreamReservoir.applyBatch(b0, "id", "w", 40, s"$work/state")
    val after = StreamReservoir.reservoir(spark, s"$work/state")
      .select("id").as[Long].collect().toSet
    assert(after === before)
  }
}

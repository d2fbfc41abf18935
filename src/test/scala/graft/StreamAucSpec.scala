package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Advanced2
import graft.streaming.StreamAuc

/** Streaming exact AUC: multi-batch state == the batch q105 result
  * over everything seen; redelivered batchIds are no-ops.
  */
class StreamAucSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docsSlices(k: Int): Seq[DataFrame] = {
    val base = graft.sources.TableCatalog.documents(spark, sfDir)
      .selectExpr("cast(n_chars as long) as score",
        "cast(case when lang = 'en' then 1 else 0 end as long) as pos",
        s"cast(doc_id % $k as int) as slice")
    (0 until k).map(i => base.filter($"slice" === i).drop("slice"))
  }

  test("3-batch streamed AUC equals the batch q105 over the union") {
    val work = Files.createTempDirectory("sauc")
    docsSlices(3).zipWithIndex.foreach { case (b, i) =>
      StreamAuc.applyBatch(b, "score", "pos", s"$work/state", Some(i.toLong))
    }
    val got = StreamAuc.auc(spark, s"$work/state")
      .as[(Long, Long, Long, Double)].collect()(0)
    val want = Advanced2.q105Auc(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()(0)
    assert(got === want)
  }

  test("redelivered batchId is a detected no-op") {
    val work = Files.createTempDirectory("saucr")
    val Seq(b0, b1) = docsSlices(2)
    StreamAuc.applyBatch(b0, "score", "pos", s"$work/state", Some(0L))
    StreamAuc.applyBatch(b1, "score", "pos", s"$work/state", Some(1L))
    val before = StreamAuc.auc(spark, s"$work/state").collect().toSeq
    StreamAuc.applyBatch(b1, "score", "pos", s"$work/state", Some(1L))
    StreamAuc.applyBatch(b0, "score", "pos", s"$work/state", Some(0L))
    assert(StreamAuc.auc(spark, s"$work/state").collect().toSeq === before)
  }

  test("real stream via foreachBatch matches the batch computation") {
    val work = Files.createTempDirectory("saucs")
    val slices = docsSlices(2)
    slices.zipWithIndex.foreach { case (b, i) =>
      b.write.parquet(s"$work/in/b=$i")
    }
    val stream = spark.readStream.schema(slices.head.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamAuc.start(stream, "score", "pos", s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()
    val got = StreamAuc.auc(spark, s"$work/state")
      .as[(Long, Long, Long, Double)].collect()(0)
    val want = Advanced2.q105Auc(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()(0)
    assert(got === want)
  }
}

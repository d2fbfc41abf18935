package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamSurvivorship

/** Streaming golden-record maintenance: per-field arg-max candidates
  * folded per microbatch == the batch q129 survivorship; redelivered
  * batchId is a no-op (n_updates sums).
  */
class StreamSurvivorshipSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  /** The q129 masked-update input, shared with the batch query. */
  private def updates: DataFrame = {
    def pres(f: String, pct: Int) =
      graft.operators.Sampling.portableBucket(
        concat(col("o_orderkey").cast("string"), lit(":" + f)), 100L) < pct
    graft.sources.TableCatalog.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        when(pres("st", 60), col("o_orderstatus")).as("status"),
        when(pres("pr", 40), col("o_orderpriority")).as("priority"),
        when(pres("tp", 25),
          round(col("o_totalprice") * 100).cast("long")).as("price_cents"))
  }

  private val fields = Seq("status", "priority", "price_cents")

  type Row6 = (Long, Option[String], Option[String], Option[Long], Long, Long)

  test("3 real streamed microbatches equal the batch q129 golden record") {
    val work = Files.createTempDirectory("ssurv")
    val u = updates
    (0 to 2).foreach { b =>
      u.filter($"o_orderkey" % 3 === b).write.parquet(s"$work/in/b=$b")
    }
    val stream = spark.readStream.schema(u.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamSurvivorship.start(stream, "o_custkey", Seq("o_orderkey"),
      fields, s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()

    val got = StreamSurvivorship.golden(spark, s"$work/state", "o_custkey",
      fields).as[Row6].collect().toSet
    val want = graft.queries.Advanced4.q129GoldenRecord(spark, sfDir)
      .as[Row6].collect().toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("redelivered batchId is a no-op; out-of-order field merge is exact") {
    val work = Files.createTempDirectory("ssurv-r")
    // seq 2 arrives BEFORE seq 1: the per-field arg-max must still
    // keep seq 2's name and seq 1's email (the only non-null one)
    val b0 = Seq((1L, 2L, Some("new"), None: Option[String]))
      .toDF("key", "seq", "name", "email")
    val b1 = Seq((1L, 1L, Some("old"), Some("e@x")))
      .toDF("key", "seq", "name", "email")
    StreamSurvivorship.applyBatch(b0, "key", Seq("seq"),
      Seq("name", "email"), s"$work/state", Some(0L))
    StreamSurvivorship.applyBatch(b1, "key", Seq("seq"),
      Seq("name", "email"), s"$work/state", Some(1L))
    def snap() = StreamSurvivorship.golden(spark, s"$work/state", "key",
        Seq("name", "email"))
      .as[(Long, Option[String], Option[String], Long, Long)].collect().toSet
    assert(snap() === Set((1L, Some("new"), Some("e@x"), 2L, 2L)))
    val before = snap()
    StreamSurvivorship.applyBatch(b1, "key", Seq("seq"),
      Seq("name", "email"), s"$work/state", Some(1L))
    assert(snap() === before, "replayed batchId must not double n_updates")
  }
}

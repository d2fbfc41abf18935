package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Decontaminate, Dedup}
import graft.streaming.StreamCorpusPipeline

class StreamCorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("scp").toString

  private val probeText = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
  private def probes = Seq((100L, probeText)).toDF("doc_id", "text")

  private val cleanA = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12"
  private val cleanB = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"
  private val contaminated = s"$probeText x1 x2"

  // ids increase across batches so streaming first-arrival == batch
  // min-id canonical representative
  private def b0 = Seq(
    (1L, cleanA),           // kept
    (2L, "too short"),      // quality drop
    (3L, cleanA),           // within-batch exact dup of 1
    (4L, contaminated)      // decontamination drop (8/10 shingles hit)
  ).toDF("doc_id", "text")
  private def b1 = Seq(
    (5L, cleanA),           // cross-batch exact dup of 1
    (6L, cleanB),           // kept
    (7L, "tiny")            // quality drop
  ).toDF("doc_id", "text")

  private def runBatches(out: String, state: String, rep: String): Unit = {
    val probeShingles = Decontaminate.probeSet(probes, "text", 3)
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      StreamCorpusPipeline.applyBatch(b, "doc_id", "text", probeShingles,
        out, state, rep, i, minTokens = 10, maxContamination = 0.2)
    }
  }

  test("streaming pipeline == batch pipeline on the concatenated corpus") {
    val (out, state, rep) = (tmp(), tmp(), tmp())
    runBatches(out, state, rep)
    val streamed = StreamCorpusPipeline.results(spark, out)
      .select("doc_id").as[Long].collect().toSet
    // batch reference: same three stages over the full corpus
    val all = b0.unionByName(b1)
    val q = all.filter(size(filter(split(trim(col("text")), "\\s+"),
      t => length(t) > 0)) >= 10)
    val reps = Dedup.exact(q, "doc_id", "text")
      .select(col("rep_id").as("doc_id"))
    val deduped = q.join(reps, Seq("doc_id"), "left_semi")
    val batchRef = Decontaminate.decontaminate(deduped, probes,
        "doc_id", "text", maxFraction = 0.2, n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batchRef, s"streamed $streamed vs batch $batchRef")
    assert(streamed == Set(1L, 6L))
  }

  test("per-batch attrition reports chain and attribute drops to their batch") {
    val (out, state, rep) = (tmp(), tmp(), tmp())
    runBatches(out, state, rep)
    val rows = StreamCorpusPipeline.reports(spark, rep)
      .select("batch_id", "stage", "docs_in", "docs_out", "docs_dropped")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(rows((0L, "quality_gate")) == ((0L, "quality_gate", 4L, 3L, 1L)))
    assert(rows((0L, "exact_dedup")) == ((0L, "exact_dedup", 3L, 2L, 1L)))
    assert(rows((0L, "decontaminate")) == ((0L, "decontaminate", 2L, 1L, 1L)))
    assert(rows((1L, "quality_gate")) == ((1L, "quality_gate", 3L, 2L, 1L)))
    // cross-batch dup of doc 1 dropped here, against persisted state
    assert(rows((1L, "exact_dedup")) == ((1L, "exact_dedup", 2L, 1L, 1L)))
    assert(rows((1L, "decontaminate")) == ((1L, "decontaminate", 1L, 1L, 0L)))
  }

  test("microbatch replay overwrites instead of duplicating (state and output)") {
    val (out, state, rep) = (tmp(), tmp(), tmp())
    runBatches(out, state, rep)
    val before = StreamCorpusPipeline.results(spark, out)
      .select("doc_id").as[Long].collect().toSet
    val probeShingles = Decontaminate.probeSet(probes, "text", 3)
    // replay batch 1: must anchor to its first attempt's state tag and
    // rewrite identical survivors, not dedup against itself
    StreamCorpusPipeline.applyBatch(b1, "doc_id", "text", probeShingles,
      out, state, rep, 1, minTokens = 10, maxContamination = 0.2)
    val after = StreamCorpusPipeline.results(spark, out)
      .select("doc_id").as[Long].collect().toSet
    assert(after == before)
    val reportRows = StreamCorpusPipeline.reports(spark, rep)
      .where(col("batch_id") === 1).count()
    assert(reportRows == 3L)
  }

  test("real stream end-to-end via foreachBatch with checkpoint restart") {
    val work = tmp()
    val all = (0 until 60).map { i =>
      val text = if (i % 5 == 0) "short doc" // quality drops
        else if (i % 5 == 1) cleanA          // one survivor, rest dup
        else s"w${i} " + (1 to 11).map(j => s"t${i}_$j").mkString(" ")
      (i.toLong, text)
    }
    (0 until 3).foreach { p =>
      all.filter(_._1 % 3 == p).toDF("doc_id", "text")
        .write.parquet(s"$work/in/part=$p")
    }
    val schema = all.take(1).toDF("doc_id", "text").schema
    def runStream(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
      val q = StreamCorpusPipeline.start(stream, "doc_id", "text", probes,
        s"$work/out", s"$work/state", s"$work/rep", s"$work/ck",
        minTokens = 10, compactEvery = 2)
      q.processAllAvailable(); q.stop()
    }
    runStream()
    runStream() // restart: nothing new, nothing changes
    val kept = StreamCorpusPipeline.results(spark, s"$work/out")
      .select("doc_id").as[Long].collect().toSet
    // every unique clean doc kept, every short doc dropped, and the
    // cleanA duplicate group keeps exactly ONE member — whichever
    // batch the file source delivered first (file order is not id
    // order, so first-arrival is the contract, not global min)
    val dupIds = all.filter(_._1 % 5 == 1).map(_._1).toSet
    assert((kept -- dupIds) == all.filter(_._1 % 5 > 1).map(_._1).toSet)
    assert((kept & dupIds).size == 1, s"dup group kept ${kept & dupIds}")
  }
}

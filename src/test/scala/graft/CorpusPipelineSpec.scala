package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline
import graft.operators.CorpusPipeline.Stage

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"
  def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("pipeline report: one materialization harvests every stage's attrition") {
    val probes = docs.filter(col("source") === "src0")
    val corpus = docs.filter(col("source") =!= "src0")
    val (result, report) = CorpusPipeline.run(corpus,
      CorpusPipeline.standardStages("doc_id", "text", probes))
    val rows = report
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) ==
      Seq("quality_gate", "exact_dedup", "near_dedup", "decontaminate"))
    // boundaries chain: stage N's docs_out is stage N+1's docs_in
    rows.sliding(2).foreach {
      case Seq(a, b) => assert(a._3 == b._2, s"boundary mismatch: $a -> $b")
      case _ =>
    }
    assert(rows.head._2 == corpus.count())
    rows.foreach { r =>
      assert(r._4 == r._2 - r._3 && r._4 >= 0, r.toString)
    }
    // the observed final count matches the materialized result
    assert(rows.last._3 == result.count())
    // every stage's arithmetic agrees with running the stages by hand
    val byHand = CorpusPipeline.standardStages("doc_id", "text", probes)
      .foldLeft(corpus)((df, s) => s.transform(df))
    assert(byHand.count() == rows.last._3)
    // the dedup stages actually dropped something on this corpus
    assert(rows.map(_._4).sum > 0, "expected attrition somewhere")
  }

  test("pipeline rejects empty and duplicate-name stage lists") {
    intercept[IllegalArgumentException] {
      CorpusPipeline.plan(docs, Nil)
    }
    intercept[IllegalArgumentException] {
      CorpusPipeline.plan(docs, Seq(
        Stage("a", identity), Stage("a", identity)))
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** RAKE phrase extraction against hand-computed degree/frequency
  * scores, and nDCG@10 boundary properties (perfect ranking = 1.0,
  * inversions < 1.0, zero-relevant sources excluded).
  */
class RakeNdcgSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("rakedocs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("RAKE: hand-computed phrase scores on a crafted corpus") {
    val d = docsDir(Seq(
      (1L, "the quick brown fox and the lazy dog", "en", "a", 38L),
      (2L, "a quick dog", "en", "a", 11L)))
    val got = graft.queries.Advanced4.textRake(spark, d)
      .as[(Long, Long, String, Long)].collect().toSet
    // word scores (deg*1e6 DIV freq): quick (3+2)/2 -> 2500000,
    // brown 3/1, fox 3/1, lazy 2/1 -> 2000000, dog (2+2)/2 -> 2000000
    assert(got === Set(
      (1L, 1L, "quick brown fox", 8500000L),
      (1L, 2L, "lazy dog", 4000000L),
      (2L, 1L, "quick dog", 4500000L)))
  }

  test("nDCG: perfect ranking scores 1.0, inversions score below, zero-relevant excluded") {
    // source p: both relevant docs are the longest -> perfect
    // source m: relevant docs are the SHORTEST -> < 1
    // source z: nothing relevant -> excluded
    val d = docsDir(Seq(
      (1L, "x", "en", "p", 100L), (2L, "x", "en", "p", 90L),
      (3L, "x", "de", "p", 80L), (4L, "x", "de", "p", 70L),
      (11L, "x", "de", "m", 100L), (12L, "x", "de", "m", 90L),
      (13L, "x", "en", "m", 80L), (14L, "x", "en", "m", 70L),
      (21L, "x", "de", "z", 50L)))
    val got = graft.queries.Advanced4.q124Ndcg(spark, d)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === Set("p", "m"))
    assert(got("p") === ((2L, 1.0)))
    assert(got("m")._2 < 1.0 && got("m")._2 > 0.0)
    // m's value by the same literal table: (d3 + d4) / (d1 + d2)
    // = (0.5 + 0.430676558073) / (1 + 0.630929753571)
    val want = BigDecimal((0.5 + 0.430676558073) / (1.0 + 0.630929753571))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("m")._2 === want)
  }
}

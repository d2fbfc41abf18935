package graft

import java.nio.file.{Files, Paths}


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusFormats

/** Fixed-width surface: round-trip incl. nulls, overflow refusal at
  * write time, and corrupt routing for torn / uncastable lines.
  */
class FixedWidthSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("code", StringType),
    StructField("amt", DoubleType)))
  private val widths = Seq(6, 4, 10)

  test("write/read round-trips values and nulls") {
    val dir = Files.createTempDirectory("fw").toString + "/data"
    val rows = Seq((1L, "AB", 12.5), (22L, "C", 0.25), (333L, "XYZQ", 1000.0))
    CorpusFormats.writeFixedWidth(rows.toDF("id", "code", "amt"), dir, widths)
    val (clean, rejects) = CorpusFormats.splitCorrupt(
      CorpusFormats.readFixedWidth(spark, dir, schema, widths))
    assert(rejects.isEmpty)
    assert(clean.as[(Long, String, Double)].collect().toSet === rows.toSet)
    // nulls become all-spaces and come back as nulls
    val dir2 = Files.createTempDirectory("fwn").toString + "/data"
    CorpusFormats.writeFixedWidth(
      Seq((7L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Double]))
        .toDF("id", "code", "amt"), dir2, widths)
    val back = CorpusFormats.splitCorrupt(
      CorpusFormats.readFixedWidth(spark, dir2, schema, widths))._1
      .collect()(0)
    assert(back.getLong(0) === 7L && back.isNullAt(1) && back.isNullAt(2))
  }

  test("a value wider than its field refuses at write time") {
    val dir = Files.createTempDirectory("fwo").toString + "/data"
    val e = intercept[Exception] {
      CorpusFormats.writeFixedWidth(
        Seq((1L, "TOOLONG", 1.0)).toDF("id", "code", "amt"), dir, widths)
    }
    assert(e.getMessage.contains("exceeds width") ||
      Option(e.getCause).exists(_.getMessage.contains("exceeds width")))
  }

  test("whitespace-edge strings refuse at write; empty string reads back null (documented)") {
    // trailing spaces: the reader's trim would hand back 'AB', not
    // 'AB ' — no faithful encoding exists, so the writer refuses
    // (the overflow-refusal convention; r12 verdict item 6)
    for (v <- Seq("AB ", " AB", "  ")) {
      val dir = Files.createTempDirectory("fww").toString + "/data"
      val e = intercept[Exception] {
        CorpusFormats.writeFixedWidth(
          Seq((1L, v, 1.0)).toDF("id", "code", "amt"), dir, widths)
      }
      assert(e.getMessage.contains("whitespace") ||
        Option(e.getCause).exists(_.getMessage.contains("whitespace")),
        s"value '$v' did not refuse: $e")
    }
    // interior whitespace is fine and round-trips
    val okDir = Files.createTempDirectory("fwi").toString + "/data"
    CorpusFormats.writeFixedWidth(
      Seq((1L, "A B", 1.0)).toDF("id", "code", "amt"), okDir, widths)
    val ok = CorpusFormats.splitCorrupt(
      CorpusFormats.readFixedWidth(spark, okDir, schema, widths))._1
    assert(ok.as[(Long, String, Double)].collect().toSeq == Seq((1L, "A B", 1.0)))
    // the one documented ambiguity: '' renders as all-spaces == null
    val emptyDir = Files.createTempDirectory("fwe").toString + "/data"
    CorpusFormats.writeFixedWidth(
      Seq((1L, "", 1.0)).toDF("id", "code", "amt"), emptyDir, widths)
    val back = CorpusFormats.splitCorrupt(
      CorpusFormats.readFixedWidth(spark, emptyDir, schema, widths))._1.collect()(0)
    assert(back.isNullAt(1))
  }

  test("torn and uncastable lines route to the corrupt column") {
    val dir = Files.createTempDirectory("fwc")
    val good = "     1AB        12.5"
    val torn = "   2CD"                    // wrong length
    val bad = "huh  3EF         1.0"       // 'huh  3' not a long
    Files.write(Paths.get(dir.toString, "part.txt"),
      (good.padTo(20, ' ') + "\n" + torn + "\n" + bad.take(20) + "\n")
        .getBytes("UTF-8"))
    val (clean, rejects) = CorpusFormats.splitCorrupt(
      CorpusFormats.readFixedWidth(spark, dir.toString, schema, widths))
    assert(clean.select("id").as[Long].collect().toSeq === Seq(1L))
    assert(rejects.count() === 2L)
  }
}

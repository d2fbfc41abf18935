package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CorpusFormats

/** XML surface: escaping round-trip, nulls, multiline text, and the
  * PERMISSIVE corrupt-record routing for torn records.
  */
class XmlFormatSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("txt", StringType),
    StructField("n", LongType)))

  test("write/read round-trips special chars, newlines, and nulls") {
    val dir = Files.createTempDirectory("xmlrt").toString + "/docs"
    val rows = Seq(
      (1L, "plain", 10L),
      (2L, "a & b < c > d \"quoted\" 'single'", 20L),
      (3L, "line one\nline two", 30L),
      (4L, null.asInstanceOf[String], 40L))
    CorpusFormats.writeXml(rows.toDF("id", "txt", "n"), dir)
    val back = CorpusFormats.readXml(spark, dir, schema)
    val (clean, rejects) = CorpusFormats.splitCorrupt(back)
    assert(rejects.isEmpty)
    assert(clean.as[(Long, Option[String], Long)].collect().toSet ===
      rows.map(r => (r._1, Option(r._2), r._3)).toSet)
  }

  test("torn record routes to the corrupt column, not a crash or drop") {
    val dir = Files.createTempDirectory("xmlcr")
    val xml =
      """<rows>
        |<row><id>1</id><txt>ok</txt><n>5</n></row>
        |<row><id>not_a_number</id><txt>bad</txt><n>6</n></row>
        |<row><id>3</id><txt>fine</txt><n>7</n></row>
        |</rows>""".stripMargin
    Files.write(Paths.get(dir.toString, "part.xml"), xml.getBytes("UTF-8"))
    val back = CorpusFormats.readXml(spark, dir.toString, schema)
    val (clean, rejects) = CorpusFormats.splitCorrupt(back)
    assert(clean.select("id").as[Long].collect().toSet === Set(1L, 3L))
    assert(rejects.count() === 1L)
  }
}

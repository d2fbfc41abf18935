package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** JPEG header probe ([[Multimodal.jpegInfo]]): hand-assembled
  * marker streams, malformed-input rejection, the synthetic
  * generator roundtrip, and the batch shape.
  */
class JpegProbeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // minimal valid stream: SOI, COM("ab"), SOF0 8-bit 300x200 3-comp
  private val sof0 = bytes(
    0xFF, 0xD8,
    0xFF, 0xFE, 0x00, 0x04, 'a', 'b',
    0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0xC8, 0x01, 0x2C, 0x03,
    0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00)

  test("hand-assembled SOF0 parses: width 300, height 200, 3 components, baseline") {
    val got = Multimodal.jpegInfo(MediaRow(7L, sof0)).get
    assert((got.width, got.height, got.components, got.progressive) ==
      ((300, 200, 3, false)))
  }

  test("SOF2 sets the progressive flag; fill bytes are tolerated") {
    val p = sof0.clone()
    p(9) = 0xC2.toByte
    assert(Multimodal.jpegInfo(MediaRow(1L, p)).get.progressive)
    // insert an extra 0xFF fill byte before the SOF marker
    val filled = (sof0.take(8) :+ 0xFF.toByte) ++ sof0.drop(8)
    val got = Multimodal.jpegInfo(MediaRow(1L, filled)).get
    assert(got.width == 300 && got.height == 200)
  }

  test("malformed streams probe to None") {
    // not a JPEG at all
    assert(Multimodal.jpegInfo(MediaRow(1L, "hello".getBytes)).isEmpty)
    // SOI then garbage (marker desync)
    assert(Multimodal.jpegInfo(
      MediaRow(1L, bytes(0xFF, 0xD8, 0x00, 0x01, 0x02))).isEmpty)
    // EOI before any SOF
    assert(Multimodal.jpegInfo(
      MediaRow(1L, bytes(0xFF, 0xD8, 0xFF, 0xD9))).isEmpty)
    // SOS before any SOF (header never declares dimensions)
    assert(Multimodal.jpegInfo(
      MediaRow(1L, bytes(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x02))).isEmpty)
    // truncated inside the SOF payload
    assert(Multimodal.jpegInfo(MediaRow(1L, sof0.take(14))).isEmpty)
    // segment length pointing past the buffer
    assert(Multimodal.jpegInfo(
      MediaRow(1L, bytes(0xFF, 0xD8, 0xFF, 0xFE, 0x7F, 0xFF, 'x'))).isEmpty)
  }

  test("synthetic generator roundtrip: parser must earn the generator's formulas") {
    (0L until 40L).foreach { id =>
      val got = Multimodal.jpegInfo(MediaRow(id, Multimodal.syntheticJpeg(id))).get
      assert(got.width == (id % 640 + 16).toInt, s"id=$id")
      assert(got.height == (id * 7 % 480 + 16).toInt, s"id=$id")
      assert(got.components == (if (id % 5 == 0) 1 else 3), s"id=$id")
      assert(got.progressive == (id % 3 == 0), s"id=$id")
    }
  }

  test("batch probe drops undecodables and keeps typed rows") {
    val rows = Seq(
      (1L, Multimodal.syntheticJpeg(1L)),
      (2L, "not a jpeg".getBytes),
      (3L, Multimodal.syntheticJpeg(3L)))
    val got = Multimodal.jpegProbeBatch(spark, rows.toDF("doc_id", "payload"),
        "doc_id", "payload")
      .as[(Long, Int, Int, Int, Boolean)].collect().map(r => r._1).sorted
    assert(got.toSeq == Seq(1L, 3L))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** MP4 / ISO-BMFF probe ([[Multimodal.mp4Info]]): generator→parser
  * round-trip for both header versions, the exact duration floor,
  * malformed rejection (truncation, bad sizes, missing boxes, zero
  * timescale), largesize and size-0 box forms, batch shape.
  */
class Mp4ProbeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def probe(bytes: Array[Byte]): Option[Multimodal.Mp4Info] =
    Multimodal.mp4Info(MediaRow(1L, bytes))

  test("generator round-trip: both mvhd/tkhd versions parse to the " +
      "doc_id formulas") {
    for (id <- Seq(0L, 1L, 2L, 3L, 5L, 7L, 42L, 299L)) {
      val got = Multimodal.mp4Info(MediaRow(id, Multimodal.syntheticMp4(id)))
        .getOrElse(fail(s"id=$id did not parse"))
      val ts = (id % 4 + 1) * 1000L
      val dur = id * 13 % 90000 + 1000L
      assert(got.timescale == ts, s"id=$id")
      assert(got.duration_ms == dur * 1000L / ts, s"id=$id")
      assert(got.n_tracks == (id % 3 + 1).toInt, s"id=$id")
      assert(got.width == (id % 640 + 16 + id % 3).toInt, s"id=$id")
      assert(got.height == (id * 7 % 480 + 16 + id % 3).toInt, s"id=$id")
      assert(got.brand == "isom")
    }
  }

  test("malformed rejection: every broken container probes to None") {
    val good = Multimodal.syntheticMp4(5L)
    assert(probe(good).isDefined)
    // truncated anywhere inside a declared box
    assert(probe(good.take(good.length - 2)).isEmpty)
    assert(probe(good.take(10)).isEmpty)
    assert(probe(Array.empty[Byte]).isEmpty)
    // not leading with ftyp
    assert(probe(good.drop(20)).isEmpty)
    // a box size smaller than the header
    val badSize = good.clone()
    badSize(0) = 0; badSize(1) = 0; badSize(2) = 0; badSize(3) = 4
    assert(probe(badSize).isEmpty)
    // a box size running past the payload
    val overSize = good.clone()
    overSize(0) = 0x7F.toByte
    assert(probe(overSize).isEmpty)
    // random noise
    assert(probe(Array.fill(64)(0x5A.toByte)).isEmpty)
  }

  test("zero timescale and missing boxes refuse to parse") {
    // rebuild id=4 (version 0: ts at mvhd payload offset 12) and
    // zero its timescale
    val bytes = Multimodal.syntheticMp4(4L)
    val s = bytes.indexOfSlice("mvhd".getBytes("US-ASCII"))
    assert(s > 0)
    val z = bytes.clone()
    for (i <- 0 until 4) z(s + 4 + 12 + i) = 0
    assert(probe(z).isEmpty)
    // moov with no trak: strip every trak by renaming the box type
    val noTrak = bytes.clone()
    var at = noTrak.indexOfSlice("trak".getBytes("US-ASCII"))
    while (at >= 0) {
      noTrak(at) = 'x'.toByte
      at = noTrak.indexOfSlice("trak".getBytes("US-ASCII"))
    }
    assert(probe(noTrak).isEmpty)
  }

  test("largesize (size==1 + 64-bit) and size==0 (to end) box forms") {
    val good = Multimodal.syntheticMp4(6L)
    // convert the trailing mdat to a size==0 box: still parses
    val mdatAt = good.indexOfSlice("mdat".getBytes("US-ASCII")) - 4
    val sizeZero = good.clone()
    for (i <- 0 until 4) sizeZero(mdatAt + i) = 0
    assert(probe(sizeZero).isDefined)
    // rebuild the free box as a largesize box (size==1 + largesize)
    val freeAt = good.indexOfSlice("free".getBytes("US-ASCII")) - 4
    val freeSize = ((good(freeAt) & 0xFF) << 24) |
      ((good(freeAt + 1) & 0xFF) << 16) |
      ((good(freeAt + 2) & 0xFF) << 8) | (good(freeAt + 3) & 0xFF)
    val ls = freeSize + 8
    val rebuilt = good.take(freeAt) ++
      Array[Byte](0, 0, 0, 1) ++ "free".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, (ls >> 24).toByte, (ls >> 16).toByte,
        (ls >> 8).toByte, ls.toByte) ++
      good.slice(freeAt + 8, freeAt + freeSize) ++
      good.drop(freeAt + freeSize)
    assert(probe(rebuilt).isDefined)
    assert(probe(rebuilt).get == probe(good).get)
  }

  private def rawBox(typ: String, payload: Array[Byte]): Array[Byte] = {
    val size = payload.length + 8
    Array[Byte]((size >> 24).toByte, (size >> 16).toByte,
      (size >> 8).toByte, size.toByte) ++
      typ.getBytes("US-ASCII") ++ payload
  }

  private def be32a(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  test("empty tkhd payload ending exactly at the array end probes to " +
      "None, not an exception (r17 — the version byte is bounds-checked)") {
    // ftyp + moov[mvhd-v0 + trak[size-8 tkhd]] with NOTHING after the
    // moov: the tkhd version byte would be read one past the array end
    val ftyp = rawBox("ftyp",
      "isom".getBytes("US-ASCII") ++ be32a(0x200) ++
        "iso2".getBytes("US-ASCII"))
    val mvhd = rawBox("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32a(0) ++ be32a(0) ++ be32a(1000) ++
        be32a(5000))
    val bytes = ftyp ++ rawBox("moov",
      mvhd ++ rawBox("trak", rawBox("tkhd", Array.empty[Byte])))
    assert(probe(bytes).isEmpty)
  }

  test("unknown tkhd versions are malformed, not parsed as v0 (r17)") {
    val good = Multimodal.syntheticMp4(2L) // version-0 layout, 3 tracks
    assert(probe(good).isDefined)
    val v2 = good.clone()
    var at = v2.indexOfSlice("tkhd".getBytes("US-ASCII"))
    while (at >= 0) {
      v2(at + 4) = 2 // the version byte, first payload byte
      at = v2.indexOfSlice("tkhd".getBytes("US-ASCII"), at + 1)
    }
    assert(probe(v2).isEmpty)
  }

  test("a version-1 duration that would overflow the millisecond " +
      "conversion probes to None (r17)") {
    val ftyp = rawBox("ftyp",
      "isom".getBytes("US-ASCII") ++ be32a(0x200) ++
        "iso2".getBytes("US-ASCII"))
    def v1mvhd(durHi: Long, durLo: Long): Array[Byte] = rawBox("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be32a(0) ++ be32a(0) ++ be32a(0) ++
        be32a(0) ++ be32a(1000) ++ be32a(durHi) ++ be32a(durLo))
    // width at payload offset 76, height at 80 for a v0 tkhd
    val tkhd = rawBox("tkhd",
      new Array[Byte](76) ++ be32a(320L << 16) ++ be32a(240L << 16))
    def clip(mvhd: Array[Byte]): Array[Byte] =
      ftyp ++ rawBox("moov", mvhd ++ rawBox("trak", tkhd))
    // all-ones be64 reads back as -1; 2^62 exceeds Long.MaxValue/1000
    assert(probe(clip(v1mvhd(0xFFFFFFFFL, 0xFFFFFFFFL))).isEmpty)
    assert(probe(clip(v1mvhd(0x40000000L, 0L))).isEmpty)
    // a sane v1 duration through the same builder still parses
    val ok = probe(clip(v1mvhd(0L, 44000L)))
    assert(ok.isDefined && ok.get.duration_ms == 44000L)
  }

  test("batch shape: malformed rows drop, well-formed rows survive") {
    val rows = Seq(
      (1L, Multimodal.syntheticMp4(1L)),
      (2L, Array.fill(32)(0x00.toByte)),
      (3L, Multimodal.syntheticMp4(3L))).toDF("doc_id", "payload")
    val got = Multimodal.mp4ProbeBatch(spark, rows, "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("contract query multimodal_mp4_probe runs at sf0.001") {
    val df = SparkEntry.queries("multimodal_mp4_probe")(
      spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing
  * (SURVEY.md §2c row 45).
  *
  * Media payloads are opaque `binary` columns with typed metadata.
  * The Spark-side plumbing — schema, batch shape, partition-level
  * processing — is real. The codec layer is split:
  *
  *  - REAL decoders for the formats parseable with the JDK alone —
  *    binary PPM (P6) and uncompressed 24-bit BMP via pure byte math,
  *    and PNG (8-bit gray/RGB/RGBA, non-interlaced) via
  *    `java.util.zip.Inflater` + the five prediction filters
  *    ([[decodeImage]]); [[encodePng]] is the matching write half.
  *    Real pixel-space nearest-neighbor resize ([[resizeImage]]) and
  *    real channel-statistics features ([[imageFeatures]]) run on the
  *    decoded pixels.
  *  - a clearly-marked deterministic STUB (`fakeDecode`) for the
  *    remaining codec-heavy formats (JPEG/video/...) that genuinely
  *    need external libraries; swapping in a real one changes one
  *    function.
  *
  * Partition-level batch processing uses `mapPartitions` over a typed
  * Dataset — the Scala analogue of batched pandas UDFs: the decoder
  * is called once per row but any per-batch state (model handles,
  * codec contexts) is initialized once per PARTITION, which is the
  * property that matters at 100 TB.
  */
object Multimodal {

  /** A decoded raster: interleaved row-major pixels, `channels` bytes
    * per pixel (3 = RGB), top-down row order.
    */
  case class DecodedImage(doc_id: Long, width: Int, height: Int,
                          channels: Int, pixels: Array[Byte]) {
    def pixel(x: Int, y: Int, c: Int): Int =
      java.lang.Byte.toUnsignedInt(pixels((y * width + x) * channels + c))
  }

  /** REAL decode for the two formats parseable without any codec
    * library. Returns None for anything else (callers fall back to
    * the declared stub).
    *
    *  - PPM P6: ASCII header `P6 <w> <h> <maxval>` (whitespace- and
    *    `#`-comment-tolerant) followed by raw interleaved RGB.
    *  - BMP: 'BM' magic, little-endian header fields (pixel offset at
    *    10, width 18, height 22, bpp 28, compression 30); supports
    *    uncompressed 24-bit, rows stored bottom-up with 4-byte pad.
    */
  def decodeImage(row: MediaRow): Option[DecodedImage] = {
    val p = row.payload
    if (p.length >= 2 && p(0) == 'P' && p(1) == '6') decodePpm(row)
    else if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') decodeBmp(row)
    else if (isPng(p)) decodePng(row)
    else None
  }

  private val PngSignature =
    Array[Byte](137.toByte, 'P', 'N', 'G', 13, 10, 26, 10)

  private def isPng(p: Array[Byte]): Boolean =
    p.length > PngSignature.length &&
      PngSignature.indices.forall(i => p(i) == PngSignature(i))

  private def decodePpm(row: MediaRow): Option[DecodedImage] = {
    val p = row.payload
    var i = 2
    def nextInt(): Long = {
      // skip whitespace and '#' comments, then read an ASCII integer
      while (i < p.length &&
        (p(i).toChar.isWhitespace || p(i) == '#')) {
        if (p(i) == '#') while (i < p.length && p(i) != '\n') i += 1
        else i += 1
      }
      var v = -1L
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (p(i) - '0'); i += 1
      }
      v
    }
    val (w, h, maxval) = (nextInt(), nextInt(), nextInt())
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    // single whitespace after maxval, then raw RGB; tolerate the
    // CRLF that Windows-side writers emit (like other practical PPM
    // readers — a strictly-read '\r'-terminated header would shift
    // every pixel by one byte)
    if (i + 1 < p.length && p(i) == '\r' && p(i + 1) == '\n') i += 2
    else i += 1
    val need = w * h * 3 // long math: absurd declared dims are
    if (need > p.length - i || need > Int.MaxValue) None // malformed
    else Some(DecodedImage(row.doc_id, w.toInt, h.toInt, 3,
      java.util.Arrays.copyOfRange(p, i, i + need.toInt)))
  }

  private def decodeBmp(row: MediaRow): Option[DecodedImage] = {
    val p = row.payload
    def le32(off: Int): Int =
      (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8) |
        ((p(off + 2) & 0xFF) << 16) | ((p(off + 3) & 0xFF) << 24)
    def le16(off: Int): Int = (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    val dataOff = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val bpp = le16(28)
    val compression = le32(30)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue ||
      bpp != 24 || compression != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val rowBytes = ((w.toLong * 3 + 3) / 4) * 4 // rows pad to 4 bytes
    // long math: declared dimensions larger than the payload (or int
    // range) are malformed, not an allocation request
    if (dataOff < 0 || rowBytes * h + dataOff > p.length) return None
    val rowBytesI = rowBytes.toInt
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y // stored bottom-up
      var x = 0
      while (x < w) {
        val s = dataOff + srcRow * rowBytesI + x * 3
        val d = (y * w + x) * 3
        out(d) = p(s + 2)     // BGR -> RGB
        out(d + 1) = p(s + 1)
        out(d + 2) = p(s)
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(row.doc_id, w, h, 3, out))
  }

  /** REAL PNG decode in pure JDK — the "compressed formats need a
    * media library" assumption is false for PNG: the codec is zlib
    * (`java.util.zip.Inflater`) plus five per-row prediction filters,
    * all byte math. Supports the overwhelmingly-common shape: 8-bit
    * depth, color types 0 (gray, 1 channel), 2 (RGB, 3) and 6 (RGBA,
    * 4), non-interlaced. Palette/16-bit/interlaced return None
    * (honest partial coverage, same contract as the other decoders).
    * CRCs are not verified — bounds checks make a corrupt chunk a
    * None, not a crash, matching the tolerant-reader behavior of the
    * PPM/BMP paths.
    */
  private def decodePng(row: MediaRow): Option[DecodedImage] = {
    val p = row.payload
    def be32(off: Int): Long =
      ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
        ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)
    try {
      // ---- chunk walk: IHDR first, concatenate IDAT data ----
      var off = PngSignature.length
      if (off + 8 + 13 > p.length || be32(off) != 13L ||
        new String(p, off + 4, 4, "US-ASCII") != "IHDR") return None
      val w = be32(off + 8)
      val h = be32(off + 12)
      val bitDepth = p(off + 16) & 0xFF
      val colorType = p(off + 17) & 0xFF
      val interlace = p(off + 20) & 0xFF
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 6 => 4; case _ => return None
      }
      if (bitDepth != 8 || interlace != 0 || w <= 0 || h <= 0 ||
        (w * channels + 1) * h > Int.MaxValue.toLong) return None
      off += 8 + 13 + 4
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && off + 8 <= p.length) {
        val len = be32(off)
        val typ = new String(p, off + 4, 4, "US-ASCII")
        if (len < 0 || off + 8 + len + 4 > p.length) return None
        if (typ == "IDAT") idat.write(p, off + 8, len.toInt)
        if (typ == "IEND") done = true
        off += 8 + len.toInt + 4
      }
      if (idat.size() == 0) return None

      // ---- zlib inflate to h * (1 filter byte + w*channels) ----
      val rowLen = w.toInt * channels
      val raw = new Array[Byte]((rowLen + 1) * h.toInt)
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var filled = 0
      while (filled < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, filled, raw.length - filled)
        // 0 bytes while unfinished = truncated stream or preset-dict
        // demand — malformed either way
        if (n == 0 && !inflater.finished()) { inflater.end(); return None }
        filled += n
      }
      inflater.end()
      if (filled < raw.length) return None

      // ---- undo per-row prediction filters ----
      val out = new Array[Byte](rowLen * h.toInt)
      val bpp = channels
      var y = 0
      while (y < h.toInt) {
        val filter = raw(y * (rowLen + 1)) & 0xFF
        val src = y * (rowLen + 1) + 1
        val dst = y * rowLen
        var i = 0
        while (i < rowLen) {
          val x = raw(src + i) & 0xFF
          val a = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0       // left
          val b = if (y > 0) out(dst - rowLen + i) & 0xFF else 0       // up
          val c = if (y > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xFF else 0
          val recon = filter match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 => // Paeth predictor
              val pp = a + b - c
              val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case _ => return None
          }
          out(dst + i) = (recon & 0xFF).toByte
          i += 1
        }
        y += 1
      }
      Some(DecodedImage(row.doc_id, w.toInt, h.toInt, channels, out))
    } catch {
      case _: IndexOutOfBoundsException | _: java.util.zip.DataFormatException => None
    }
  }

  /** Minimal PNG encode (filter-0 rows, one IDAT, correct CRCs) —
    * the write half of the pure-JDK codec, used to persist processed
    * rasters and to round-trip-test the decoder.
    */
  def encodePng(img: DecodedImage): Array[Byte] = {
    require(Set(1, 3, 4).contains(img.channels),
      s"PNG encode supports 1/3/4 channels, got ${img.channels}")
    val colorType = img.channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSignature, 0, PngSignature.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      out.write(be32(data.length), 0, 4)
      val typB = typ.getBytes("US-ASCII")
      out.write(typB, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(typB); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    val rowLen = img.width * img.channels
    val raw = new Array[Byte]((rowLen + 1) * img.height)
    var y = 0
    while (y < img.height) { // filter byte 0 + raw row
      System.arraycopy(img.pixels, y * rowLen, raw, y * (rowLen + 1) + 1, rowLen)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](8192)
    val z = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** REAL nearest-neighbor resize on decoded pixels. */
  def resizeImage(img: DecodedImage, outW: Int, outH: Int): DecodedImage = {
    val out = new Array[Byte](outW * outH * img.channels)
    var y = 0
    while (y < outH) {
      val sy = math.min(img.height - 1, y * img.height / outH)
      var x = 0
      while (x < outW) {
        val sx = math.min(img.width - 1, x * img.width / outW)
        var c = 0
        while (c < img.channels) {
          out((y * outW + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    DecodedImage(img.doc_id, outW, outH, img.channels, out)
  }

  /** REAL image features from decoded pixels: per-channel means plus
    * a normalized luminance histogram — ready for the ANN operators.
    */
  def imageFeatures(img: DecodedImage, lumaBins: Int = 13): Array[Float] = {
    val means = new Array[Float](img.channels)
    val hist = new Array[Float](lumaBins)
    val nPix = img.width * img.height
    var i = 0
    while (i < nPix) {
      var luma = 0
      var c = 0
      while (c < img.channels) {
        val v = java.lang.Byte.toUnsignedInt(img.pixels(i * img.channels + c))
        means(c) += v
        luma += v
        c += 1
      }
      hist(luma / img.channels * lumaBins / 256) += 1f
      i += 1
    }
    var c = 0
    while (c < img.channels) { means(c) /= nPix * 255f; c += 1 }
    var b = 0
    while (b < lumaBins) { hist(b) /= nPix; b += 1 }
    means ++ hist
  }

  /** Batch decode of real images: payloads that parse as PPM/BMP
    * become (meta, resized thumbnail, feature vector) rows;
    * undecodable payloads are dropped. The per-partition init point
    * is where a real compressed-format codec context would live.
    */
  def decodeImages(spark: SparkSession, df: DataFrame,
                   idCol: String, payloadCol: String,
                   thumbW: Int = 8, thumbH: Int = 8): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decodeImage(r).map { img =>
            val thumb = resizeImage(img, thumbW, thumbH)
            (img.doc_id, img.width.toLong, img.height.toLong,
              if (r.payload(0) == 'P') "ppm" else "bmp",
              thumb.pixels, imageFeatures(img))
          }
        }
      }
      .toDF("doc_id", "width", "height", "format", "thumbnail", "features")
  }

  /** 64-bit perceptual hash (the classic DCT pHash): luma plane →
    * 32x32 resample → 2D DCT-II → the 8x8 low-frequency block → one
    * bit per coefficient, set when above the block's median (DC term
    * excluded from the median so a uniform brightness shift cannot
    * saturate the hash). Visually similar images land within a few
    * bits of each other; unrelated images differ in ~32 — the image
    * analog of SimHash, and the basis for [[phashPairs]]' banded
    * near-dup join. Pure double math (no codec, no library), O(N^3)
    * on the 32-wide plane — ~33k multiplies per image.
    */
  def phash64(img: DecodedImage): Long = {
    val N = 32
    val s = if (img.width == N && img.height == N) img
            else resizeImage(img, N, N)
    val luma = new Array[Double](N * N)
    var i = 0
    while (i < N * N) {
      var sum = 0
      var c = 0
      while (c < s.channels) {
        sum += java.lang.Byte.toUnsignedInt(s.pixels(i * s.channels + c))
        c += 1
      }
      luma(i) = sum.toDouble / s.channels
      i += 1
    }
    // separable DCT-II with a shared cosine table
    val cos = Array.tabulate(N, N)((k, n) =>
      math.cos(math.Pi * k * (2 * n + 1) / (2 * N)))
    val rows = new Array[Double](N * N) // rows(y*N + k) = row-DCT
    var y = 0
    while (y < N) {
      var k = 0
      while (k < N) {
        var acc = 0.0
        var x = 0
        while (x < N) { acc += luma(y * N + x) * cos(k)(x); x += 1 }
        rows(y * N + k) = acc
        k += 1
      }
      y += 1
    }
    // column DCT of the 8x8 low-frequency block only
    val block = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < N) { acc += rows(yy * N + u) * cos(v)(yy); yy += 1 }
        block(v * 8 + u) = acc
        u += 1
      }
      v += 1
    }
    val sorted = block.drop(1).sorted // median excludes the DC term
    val median = (sorted(31) + sorted(32)) / 2.0
    // DC (index 0) is excluded from the HASH too, not just the
    // median: it sits above the AC median for almost every image, so
    // including it would pin bit 0 near-constant and waste one of the
    // 64 bits of Hamming discrimination (classic DCT pHash drops DC).
    // Bit 0 stays a fixed 0 — 63 informative AC bits.
    var bits = 0L
    i = 1
    while (i < 64) {
      if (block(i) > median) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Per-document perceptual hashes: decode in partition batches,
    * undecodable payloads dropped.
    */
  def phashes(spark: SparkSession, df: DataFrame,
              idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions(rows => rows.flatMap(r =>
        decodeImage(r).map(img => (img.doc_id, phash64(img)))))
      .toDF("doc_id", "phash")
  }

  /** Near-duplicate IMAGE pairs by perceptual hash: the 64-bit hash
    * splits into 8 one-byte bands; two hashes within `maxHamming <= 7`
    * bits agree on at least one band (pigeonhole), so the candidate
    * join is an equi-join on (band, byte) — hash-only postings, the
    * same scale discipline as the text near-dup operators — and the
    * exact Hamming distance is the residual check (`bit_count(xor)`).
    * Over-cap band buckets are skipped, the text LSH cap's analog, so
    * a degenerate corpus of identical frames cannot go quadratic.
    */
  def phashPairs(spark: SparkSession, df: DataFrame,
                 idCol: String, payloadCol: String,
                 maxHamming: Int = 6,
                 maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming <= 7,
      "maxHamming > 7 breaks the 8-band pigeonhole recall guarantee")
    val hashed = phashes(spark, df, idCol, payloadCol)
    val banded = hashed.select(col("doc_id"), col("phash"),
      explode(array((0 until 8).map(bnd =>
        struct(lit(bnd).as("band"),
          shiftright(col("phash"), bnd * 8).bitwiseAND(lit(255L))
            .as("byte"))): _*)).as("bb"))
      .select(col("doc_id"), col("phash"), col("bb.band"), col("bb.byte"))
    val underCap = banded.groupBy("band", "byte")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") <= maxBucketSize)
      .select("band", "byte")
    val capped = banded.join(underCap, Seq("band", "byte"))
    val a = capped.select(col("band"), col("byte"),
      col("doc_id").as("id_a"), col("phash").as("ph_a"))
    val b = capped.select(col("band"), col("byte"),
      col("doc_id").as("id_b"), col("phash").as("ph_b"))
    a.join(b, Seq("band", "byte"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Deterministic synthetic PPM payload — the environment ships no
    * image corpus, so the phash contract query and specs render their
    * own: documents sharing `id % classes` draw the same smooth
    * class pattern (a class-keyed sinusoid — low-frequency content,
    * which is what pHash measures) with a single per-doc pixel
    * perturbation, making intra-class pairs near-duplicates and
    * cross-class pairs distant. Exercises the REAL P6 codec path
    * end-to-end.
    */
  def syntheticPpm(id: Long, classes: Int = 20): Array[Byte] = {
    val w = 16; val h = 16
    val cls = ((id % classes) + classes) % classes
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (128 + 96 * math.sin((x * (cls + 2) + y * (2 * cls + 3)) * 0.35)).toInt
        val i = (y * w + x) * 3
        px(i) = v.toByte; px(i + 1) = v.toByte; px(i + 2) = v.toByte
        x += 1
      }
      y += 1
    }
    val pos = ((id / classes) % (w * h)).toInt * 3
    px(pos) = math.min(255, java.lang.Byte.toUnsignedInt(px(pos)) + 6).toByte
    header ++ px
  }

  /** Deterministic 16-bit mono PCM WAV: a pure tone whose frequency
    * is a function of `id % classes` (same class → same tone) — the
    * audio analog of [[syntheticPpm]], for driving the REAL WAV
    * decode + feature path when the corpus ships no audio.
    */
  def syntheticWav(id: Long, samples: Int = 800, rate: Int = 8000,
                   classes: Int = 20): Array[Byte] = {
    val cls = ((id % classes) + classes) % classes
    val freq = 200.0 + cls * 50.0
    val data = new Array[Byte](samples * 2)
    var i = 0
    while (i < samples) {
      val v = (math.sin(2 * math.Pi * freq * i / rate) * 16000.0).toInt
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(rate) ++ le32(rate * 2) ++ le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  /** A media row: id + opaque payload. */
  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed metadata produced by the decode step. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       format: String, checksum: Long)

  /** STUB decoder for formats whose codecs are absent in this
    * environment (PNG/JPEG/WAV...) — deterministic fake deriving
    * pseudo-metadata from the byte length and a rolling checksum so
    * the pipeline shape stays fully testable. PPM/BMP payloads never
    * reach this: [[decodeImage]] parses them for real.
    */
  def fakeDecode(row: MediaRow): MediaMeta = {
    val n = row.payload.length.toLong
    MediaMeta(row.doc_id, n, width = n % 640, height = (n * 7) % 480,
      format = if (n % 2 == 0) "png" else "jpeg",
      checksum = rollingChecksum(row.payload))
  }

  private def rollingChecksum(p: Array[Byte]): Long = {
    var ck = 0L
    var i = 0
    while (i < p.length) { ck = ck * 31 + p(i); i += 1 }
    ck
  }

  /** Batch decode: binary payload column → typed metadata Dataset.
    * Real header parse for PPM/BMP; declared stub for everything
    * else. Per-partition initialization happens in `mapPartitions`
    * (the place a real codec/model handle would be created once).
    */
  def decodeMeta(spark: SparkSession, df: DataFrame,
                 idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init point (codec context / model handle)
        rows.map { r =>
          decodeImage(r) match {
            case Some(img) =>
              MediaMeta(r.doc_id, r.payload.length.toLong,
                img.width.toLong, img.height.toLong,
                if (r.payload(0) == 'P') "ppm"
                else if (r.payload(0) == 'B') "bmp"
                else "png",
                rollingChecksum(r.payload))
            case None => fakeDecode(r)
          }
        }
      }
  }

  /** Pure-column variant of the metadata extraction (codegen'd, used
    * by the oracle-checked query): length-derived fields only.
    */
  def metaColumns(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(payloadCol)).cast("bigint").as("n_bytes"),
      (octet_length(col(payloadCol)).cast("bigint") % 640).as("width"),
      (octet_length(col(payloadCol)).cast("bigint") * 7 % 480).as("height"),
      when(octet_length(col(payloadCol)) % 2 === 0, "png").otherwise("jpeg").as("format"))

  /** Decoded PCM audio: interleaved 16-bit samples as doubles in
    * [-1, 1].
    */
  case class DecodedAudio(doc_id: Long, sampleRate: Int, channels: Int,
                          samples: Array[Double]) {
    def durationSeconds: Double =
      if (sampleRate == 0 || channels == 0) 0.0
      else samples.length.toDouble / channels / sampleRate
  }

  /** REAL decode for RIFF/WAV with 16-bit PCM — the audio format
    * parseable without any codec library. Walks the RIFF chunk list
    * (fmt / data may be preceded by LIST etc.), little-endian fields.
    * Returns None for anything else.
    */
  def decodeAudio(row: MediaRow): Option[DecodedAudio] = {
    val p = row.payload
    def le32(off: Int): Int =
      (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8) |
        ((p(off + 2) & 0xFF) << 16) | ((p(off + 3) & 0xFF) << 24)
    def le16(off: Int): Int = (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
    def tag(off: Int): String = new String(p, off, 4, "US-ASCII")
    if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var samples: Array[Double] = null
    while (off + 8 <= p.length) {
      val id = tag(off)
      val size = le32(off + 4)
      // a negative size must not loop; one larger than the payload
      // must not overflow the Int offset into a negative index
      if (size < 0 || size > p.length) return None
      if (id == "fmt " && off + 8 + 16 <= p.length) {
        val fmt = le16(off + 8)
        channels = le16(off + 10)
        sampleRate = le32(off + 12)
        bits = le16(off + 22)
        if (fmt != 1 || bits != 16) return None // PCM 16-bit only
      } else if (id == "data" && sampleRate > 0) {
        val n = math.min(size, p.length - off - 8) / 2
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          val lo = p(off + 8 + i * 2) & 0xFF
          val hi = p(off + 8 + i * 2 + 1).toInt // sign-extends
          out(i) = ((hi << 8) | lo) / 32768.0
          i += 1
        }
        samples = out
      }
      off += 8 + size + (size & 1) // chunks pad to even length
    }
    if (samples == null || channels <= 0) None
    else Some(DecodedAudio(row.doc_id, sampleRate, channels, samples))
  }

  /** REAL audio features from decoded samples: duration, RMS energy,
    * zero-crossing rate, peak amplitude — the standard cheap audio
    * quality/VAD signals.
    */
  def audioFeatures(a: DecodedAudio): (Double, Double, Double, Double) = {
    var sumSq = 0.0
    var peak = 0.0
    var zc = 0L
    var i = 0
    while (i < a.samples.length) {
      val v = a.samples(i)
      sumSq += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && (a.samples(i - 1) >= 0) != (v >= 0)) zc += 1
      i += 1
    }
    val n = math.max(1, a.samples.length)
    (a.durationSeconds, math.sqrt(sumSq / n), zc.toDouble / n, peak)
  }

  /** Batch audio decode: WAV payloads become
    * (doc_id, sample_rate, channels, duration_s, rms, zcr, peak)
    * rows; undecodable payloads are dropped.
    */
  def decodeAudioBatch(spark: SparkSession, df: DataFrame,
                       idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decodeAudio(r).map { a =>
            val (dur, rms, zcr, peak) = audioFeatures(a)
            (a.doc_id, a.sampleRate, a.channels, dur, rms, zcr, peak)
          }
        }
      }
      .toDF("doc_id", "sample_rate", "channels", "duration_s", "rms", "zcr", "peak")
  }

  /** JPEG header facts from the first SOF frame marker. */
  case class JpegInfo(doc_id: Long, width: Int, height: Int,
                      components: Int, progressive: Boolean)

  /** REAL JPEG header PROBE — dimensions, component count and the
    * progressive flag from the marker stream (ITU T.81 §B): walk
    * FF-prefixed segments (fill bytes tolerated, standalone markers
    * skipped) to the first SOF frame header (C0–CF except C4 DHT /
    * C8 JPG / CC DAC), whose payload is
    * [precision][height:2][width:2][ncomponents]. Entropy DECODE
    * stays out of scope (needs a codec library — absent, the
    * documented stub), but the metadata probe is pure byte math:
    * exactly the width/height/progressive facts a corpus pipeline
    * filters and bins on. None on anything malformed (no SOI, EOI or
    * SOS before a SOF, truncated or undersized segments).
    */
  def jpegInfo(row: MediaRow): Option[JpegInfo] = {
    val p = row.payload
    def u8(i: Int): Int = p(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
    var off = 2
    while (off + 1 < p.length) {
      if (u8(off) != 0xFF) return None
      var mOff = off + 1
      while (mOff < p.length && u8(mOff) == 0xFF) mOff += 1 // fill bytes
      if (mOff >= p.length) return None
      val m = u8(mOff)
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) off = mOff + 1
      else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS before SOF
      else {
        if (mOff + 2 >= p.length) return None
        val len = be16(mOff + 1)
        if (len < 2 || mOff + 1 + len > p.length) return None
        val isSof = m >= 0xC0 && m <= 0xCF &&
          m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (len < 8) return None
          return Some(JpegInfo(row.doc_id, be16(mOff + 6), be16(mOff + 4),
            u8(mOff + 8),
            progressive = m == 0xC2 || m == 0xC6 || m == 0xCA || m == 0xCE))
        }
        off = mOff + 1 + len
      }
    }
    None
  }

  /** Batch JPEG probe — the [[decodeAudioBatch]] shape: typed rows
    * through mapPartitions, undecodables dropped.
    */
  def jpegProbeBatch(spark: SparkSession, df: DataFrame,
                     idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions(_.flatMap(r => jpegInfo(r).map(i =>
        (i.doc_id, i.width, i.height, i.components, i.progressive))))
      .toDF("doc_id", "width", "height", "components", "progressive")
  }

  /** Deterministic header-only synthetic JPEG (SOI, JFIF APP0, an
    * id-length COM segment to exercise the walk, SOF0 or SOF2, a
    * stub SOS + fake entropy bytes, EOI): the header parses for
    * real; the body is deliberately undecodable — which is exactly
    * the real-world shape for a probe-only pipeline stage.
    */
  def syntheticJpeg(id: Long): Array[Byte] = {
    val w = (((id % 640) + 640) % 640 + 16).toInt
    val h = (((id * 7 % 480) + 480) % 480 + 16).toInt
    val nc = if (id % 5 == 0) 1 else 3
    val sof = if (id % 3 == 0) 0xC2 else 0xC0
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def be16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xFF); b(0xD8)
    b(0xFF); b(0xE0); be16(16)
    out.write("JFIF".getBytes("US-ASCII")); b(0)
    b(1); b(1); b(0); be16(1); be16(1); b(0); b(0)
    val com = s"graft synthetic $id".getBytes("US-ASCII")
    b(0xFF); b(0xFE); be16(com.length + 2); out.write(com)
    b(0xFF); b(sof); be16(8 + 3 * nc); b(8); be16(h); be16(w); b(nc)
    (0 until nc).foreach { c => b(c + 1); b(0x11); b(0) }
    b(0xFF); b(0xDA); be16(2 + 1 + 2 * nc + 3); b(nc)
    (0 until nc).foreach { c => b(c + 1); b(0) }
    b(0); b(63); b(0)
    b(0x12); b(0x34)
    b(0xFF); b(0xD9)
    out.toByteArray
  }

  /** A media row with an extracted feature vector. */
  case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Feature-extraction stub: normalized 16-bin byte histogram per
    * payload — the batch shape of an embedding model over media
    * (replace the histogram with a real encoder; everything
    * downstream, including ANN search over the features, is real).
    */
  def extractFeatures(spark: SparkSession, df: DataFrame,
                      idCol: String, payloadCol: String,
                      bins: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init point (a real model loads here, once)
        rows.map { r =>
          val hist = new Array[Float](bins)
          var i = 0
          while (i < r.payload.length) {
            hist(java.lang.Byte.toUnsignedInt(r.payload(i)) * bins / 256) += 1f
            i += 1
          }
          val n = math.max(1, r.payload.length).toFloat
          var b = 0
          while (b < bins) { hist(b) /= n; b += 1 }
          MediaFeatures(r.doc_id, hist)
        }
      }
  }

  /** Resize stub: stride-sample the payload down to at most
    * `targetBytes` (the batch shape of an image resize — constant
    * per-row output size, pure function of the payload).
    */
  def resize(spark: SparkSession, df: DataFrame, idCol: String,
             payloadCol: String, targetBytes: Int = 256): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          if (r.payload.length <= targetBytes) r
          else {
            val stride = r.payload.length.toDouble / targetBytes
            val out = new Array[Byte](targetBytes)
            var i = 0
            while (i < targetBytes) { out(i) = r.payload((i * stride).toInt); i += 1 }
            MediaRow(r.doc_id, out)
          }
        }
      }
  }

  /** Frame/sample extraction stub: fixed-size byte windows from the
    * payload — the batch shape of video frame sampling. Emits
    * (doc_id, frame_no, frame_bytes).
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frameSize: Int = 64, maxFrames: Int = 4): DataFrame = {
    val nFrames = least(ceil(octet_length(col(payloadCol)).cast("double") / frameSize).cast("int"),
      lit(maxFrames))
    df.select(col(idCol),
        explode(sequence(lit(0), nFrames - 1)).as("frame_no"),
        col(payloadCol).as("__p"))
      .select(col(idCol), col("frame_no").cast("bigint").as("frame_no"),
        expr(s"substring(__p, frame_no * $frameSize + 1, $frameSize)").as("frame_bytes"))
  }

  /** Probed MP4 container facts. */
  case class Mp4Info(doc_id: Long, duration_ms: Long, timescale: Long,
                     n_tracks: Int, width: Int, height: Int,
                     brand: String)

  /** REAL MP4 / ISO-BMFF container PROBE (ISO/IEC 14496-12) — the
    * video member of the probe family ([[jpegInfo]]'s convention
    * applied to the container the reference's media columns actually
    * ship in): pure byte-math BOX WALK, no codec anywhere.
    *
    *  - Top level: [size:4][type:4] boxes (size == 1 → 64-bit
    *    largesize follows; size == 0 → extends to end of payload);
    *    the file must LEAD with `ftyp` (major brand = first 4 payload
    *    bytes); unknown boxes (free, mdat, …) are skipped by size.
    *  - `moov` → `mvhd` (version 0: 32-bit timescale/duration at
    *    payload offsets 12/16; version 1: 64-bit times push them to
    *    20/24) gives duration_ms = duration·1000 DIV timescale —
    *    exact integer floor, identical in every engine.
    *  - Each `trak` → `tkhd` (width/height are 16.16 fixed point at
    *    payload offset 76/80 for v0, 88/92 for v1); the probe
    *    reports the track COUNT and the max dimensions.
    *
    * Entropy/codec decode stays out of scope (no codec libraries in
    * the environment — the documented stub); duration, track count,
    * and display dimensions are exactly what a corpus pipeline
    * filters and bins video on. None on anything malformed: missing/
    * non-leading ftyp, no moov, no mvhd, zero timescale, no tracks,
    * any box whose declared size is undersized or runs past the
    * payload.
    */
  def mp4Info(row: MediaRow): Option[Mp4Info] = {
    val p = row.payload
    def u8(i: Int): Int = p(i) & 0xFF
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
        u8(i + 3)) & 0xFFFFFFFFL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    /** (boxType, payloadStart, payloadEnd) for boxes in [from, to). */
    def boxes(from: Int, to: Int): Option[List[(String, Int, Int)]] = {
      val out = scala.collection.mutable.ListBuffer.empty[(String, Int, Int)]
      var off = from
      while (off < to) {
        if (off + 8 > to) return None
        val size0 = be32(off)
        val typ = new String(p, off + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        val (payloadStart, boxEnd) =
          if (size0 == 1L) {
            if (off + 16 > to) return None
            val ls = be64(off + 8)
            if (ls < 16 || off + ls > to) return None
            (off + 16, off + ls.toInt)
          } else if (size0 == 0L) (off + 8, to)
          else {
            if (size0 < 8 || off + size0 > to) return None
            (off + 8, off + size0.toInt)
          }
        out += ((typ, payloadStart, boxEnd))
        off = boxEnd
      }
      Some(out.toList)
    }
    if (p.length < 16) return None
    boxes(0, p.length).flatMap { top =>
      top.headOption.filter(_._1 == "ftyp").flatMap { case (_, fs, fe) =>
        if (fe - fs < 4) None
        else {
          val brand = new String(p, fs, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          top.find(_._1 == "moov").flatMap { case (_, ms, me) =>
            boxes(ms, me).flatMap { kids =>
              val mvhd = kids.find(_._1 == "mvhd").flatMap {
                case (_, s, e) =>
                  if (e - s < 20) None
                  else {
                    val v = u8(s)
                    if (v == 0 && e - s >= 20)
                      Some((be32(s + 12), be32(s + 16)))
                    else if (v == 1 && e - s >= 32)
                      Some((be32(s + 20), be64(s + 24)))
                    else None
                  }
              }
              val tkhds = kids.filter(_._1 == "trak").flatMap {
                case (_, ts, te) => boxes(ts, te).toList.flatMap(
                  _.find(_._1 == "tkhd").flatMap { case (_, s, e) =>
                    // bounds-check BEFORE the version byte read: a
                    // size-8 tkhd (empty payload) ending exactly at
                    // the array end would otherwise throw out of
                    // mapPartitions and fail the whole job on one
                    // adversarial row (r17); unknown versions are
                    // malformed, not v0 (the mvhd convention)
                    if (e - s < 1) None
                    else u8(s) match {
                      case v @ (0 | 1) =>
                        val (wOff, hOff) = if (v == 1) (88, 92) else (76, 80)
                        if (e - s < hOff + 4) None
                        else Some(((be32(s + wOff) >> 16).toInt,
                          (be32(s + hOff) >> 16).toInt))
                      case _ => None
                    }
                  })
              }
              mvhd.flatMap { case (ts, dur) =>
                // a version-1 be64 duration can be any Long bit
                // pattern: negative or above Long.MaxValue/1000 the
                // millisecond conversion would wrap — malformed (r17)
                if (ts <= 0 || dur < 0 || dur > Long.MaxValue / 1000L ||
                  tkhds.isEmpty) None
                else Some(Mp4Info(row.doc_id, dur * 1000L / ts, ts,
                  tkhds.size, tkhds.map(_._1).max, tkhds.map(_._2).max,
                  brand))
              }
            }
          }
        }
      }
    }
  }

  /** Batch MP4 probe — the [[jpegProbeBatch]] shape: typed rows
    * through mapPartitions, malformed payloads dropped.
    */
  def mp4ProbeBatch(spark: SparkSession, df: DataFrame,
                    idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions(_.flatMap(r => mp4Info(r).map(i =>
        (i.doc_id, i.duration_ms, i.timescale, i.n_tracks, i.width,
          i.height, i.brand))))
      .toDF("doc_id", "duration_ms", "timescale", "n_tracks", "width",
        "height", "brand")
  }

  /** Deterministic synthetic MP4 (ftyp + a free box + moov[mvhd +
    * n·trak[tkhd]] + an mdat stub): container metadata is doc_id
    * formulas so the oracle can replay the GENERATOR while Spark
    * must earn the values through the PARSER (the [[syntheticJpeg]]
    * convention). Alternates mvhd/tkhd version 0/1 by id to exercise
    * both header layouts; the mdat body is deliberately undecodable.
    */
  def syntheticMp4(id: Long): Array[Byte] = {
    val ver = (id % 2).toInt
    val ts = (id % 4 + 1) * 1000L
    val dur = (id * 13 % 90000) + 1000L
    val nTracks = (id % 3 + 1).toInt
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val size = payload.length + 8
      out.write(Array[Byte]((size >> 24).toByte, (size >> 16).toByte,
        (size >> 8).toByte, size.toByte))
      out.write(typ.getBytes("US-ASCII"))
      out.write(payload)
      out.toByteArray
    }
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      (v & 0xFF).toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v)
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0x200) ++
        "iso2".getBytes("US-ASCII"))
    val free = box("free", s"graft synthetic $id".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      (if (ver == 0)
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(ts) ++
          be32(dur)
      else
        Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(ts) ++
          be64(dur)) ++
        be32(0x00010000L) ++ Array[Byte](1, 0) ++ new Array[Byte](10) ++
        (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
          be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
          be32(0x40000000L)) ++ new Array[Byte](24) ++ be32(nTracks + 1L))
    val traks = (0 until nTracks).map { k =>
      val w = (id % 640 + 16 + k)
      val h = (id * 7 % 480 + 16 + k)
      val tkhd = box("tkhd",
        (if (ver == 0)
          Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++ be32(k + 1L) ++
            be32(0) ++ be32(dur)
        else
          Array[Byte](1, 0, 0, 7) ++ be64(0) ++ be64(0) ++ be32(k + 1L) ++
            be32(0) ++ be64(dur)) ++
          new Array[Byte](8) ++ new Array[Byte](8) ++
          (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
            be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
            be32(0x40000000L)) ++ be32(w << 16) ++ be32(h << 16))
      box("trak", tkhd)
    }
    val moov = box("moov", (mvhd +: traks).reduce(_ ++ _))
    val mdat = box("mdat", Array[Byte](0x12, 0x34, 0x56))
    ftyp ++ free ++ moov ++ mdat
  }
}

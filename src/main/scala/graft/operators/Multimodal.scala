package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing
  * (SURVEY.md §2c row 45).
  *
  * Media payloads are opaque `binary` columns with typed metadata.
  * The Spark-side plumbing — schema, batch shape, partition-level
  * processing — is real; the actual codec step is a clearly-marked
  * deterministic STUB (`fakeDecode`) because no image/audio libraries
  * exist in this environment. Swapping in a real decoder changes one
  * function.
  *
  * Partition-level batch processing uses `mapPartitions` over a typed
  * Dataset — the Scala analogue of batched pandas UDFs: the decoder
  * is called once per row but any per-batch state (model handles,
  * codec contexts) is initialized once per PARTITION, which is the
  * property that matters at 100 TB.
  */
object Multimodal {

  /** A media row: id + opaque payload. */
  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed metadata produced by the decode step. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       format: String, checksum: Long)

  /** STUB decoder — deterministic fake. A real implementation would
    * parse the container header (PNG/JPEG/WAV...); this derives
    * pseudo-metadata from the byte length and a rolling checksum so
    * the pipeline shape is fully testable.
    */
  def fakeDecode(row: MediaRow): MediaMeta = {
    val n = row.payload.length.toLong
    var ck = 0L
    var i = 0
    while (i < row.payload.length) { ck = ck * 31 + row.payload(i); i += 1 }
    MediaMeta(row.doc_id, n, width = n % 640, height = (n * 7) % 480,
      format = if (n % 2 == 0) "png" else "jpeg", checksum = ck)
  }

  /** Batch decode: binary payload column → typed metadata Dataset.
    * Per-partition initialization happens in `mapPartitions` (the
    * place a real codec/model handle would be created once).
    */
  def decodeMeta(spark: SparkSession, df: DataFrame,
                 idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(payloadCol).as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init point (codec context / model handle)
        rows.map(fakeDecode)
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
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25Index
import graft.streaming.StreamBm25Refresh

/** Streaming BM25 index maintenance: streamed batches == one-shot
  * build (exact scores), replay idempotence, bucket pruning in every
  * root, consolidation bounding the root count.
  */
class StreamBm25RefreshSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private val probes = Seq(1L -> "spark table join", 2L -> "window agg stream")

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def run(dir: String) = Bm25Index.query(spark, dir, probes, k = 5)
    .select(col("query_id"), col("doc"), col("rank"), col("bm25"))
    .as[(Long, Long, Long, Double)].collect().toSet

  test("build(half) + 2 streamed batches == build(full); replay adds nothing; pruning holds") {
    val fullDir = Files.createTempDirectory("sbm25_full").toString
    Bm25Index.build(docs, "doc_id", "text", fullDir)

    val streamDir = Files.createTempDirectory("sbm25_inc").toString
    Bm25Index.build(docs.filter($"doc_id" % 2 === 0), "doc_id", "text", streamDir)
    assert(StreamBm25Refresh.applyBatch(docs.filter($"doc_id" % 4 === 1),
      "doc_id", "text", streamDir, 0L) > 0)
    assert(StreamBm25Refresh.applyBatch(docs.filter($"doc_id" % 4 === 3),
      "doc_id", "text", streamDir, 1L) > 0)

    val full = run(fullDir)
    assert(run(streamDir) == full && full.nonEmpty)

    // replayed microbatch overwrites its own delta root: no duplicate
    // postings, identical scores (BM25 is df/dl-sensitive, so a
    // doubled posting row would shift scores, not just counts)
    StreamBm25Refresh.applyBatch(docs.filter($"doc_id" % 4 === 3),
      "doc_id", "text", streamDir, 1L)
    assert(run(streamDir) == full)

    // an empty batch writes no root
    assert(StreamBm25Refresh.applyBatch(docs.filter($"doc_id" < 0),
      "doc_id", "text", streamDir, 2L) == 0L)
    assert(!new java.io.File(s"$streamDir/delta/batch_2").exists())

    // multi-root query still prunes every postings/df scan to the
    // probe-term buckets
    val plan = Bm25Index.query(spark, streamDir, probes, k = 5)
      .queryExecution.executedPlan.toString
    val rootScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains(streamDir))
      .filter(l => l.contains("postings") || l.contains("/df")).toSeq
    assert(rootScans.size >= 6, s"expected base + 2 delta roots x 2 tables:\n$plan")
    assert(rootScans.forall(_.contains("PartitionFilters: [b")),
      s"an unpruned index root:\n${rootScans.mkString("\n")}")
  }

  test("long stream consolidates delta roots; scores stay exact") {
    val dir = Files.createTempDirectory("sbm25_compact").toString
    Bm25Index.build(docs.filter($"doc_id" % 2 === 0), "doc_id", "text", dir)
    (0 until 6).foreach { b =>
      StreamBm25Refresh.applyBatch(docs.filter($"doc_id" % 12 === 2 * b + 1),
        "doc_id", "text", dir, b.toLong, compactEvery = 2)
    }
    val deltaDirs = new java.io.File(s"$dir/delta").listFiles().map(_.getName)
    assert(deltaDirs.count(_.startsWith("batch_")) <= 2, deltaDirs.mkString(","))
    assert(deltaDirs.exists(_.startsWith("compact_")), deltaDirs.mkString(","))

    val fullDir = Files.createTempDirectory("sbm25_compact_full").toString
    Bm25Index.build(docs, "doc_id", "text", fullDir)
    assert(run(dir) == run(fullDir) && run(dir).nonEmpty)
  }

  test("replayed consolidation reclaims crash leftovers below the compact floor") {
    val dir = Files.createTempDirectory("sbm25_crash").toString
    Bm25Index.build(docs.filter($"doc_id" % 2 === 0), "doc_id", "text", dir)
    (0 until 4).foreach { b =>
      StreamBm25Refresh.applyBatch(docs.filter($"doc_id" % 8 === 2 * b + 1),
        "doc_id", "text", dir, b.toLong, compactEvery = 2)
    }
    // first attempt of the consolidating batch: writes compact_3,
    // sweeps, folds an empty delta
    StreamBm25Refresh.applyBatch(docs.filter($"doc_id" < 0),
      "doc_id", "text", dir, 4L, compactEvery = 2)
    // simulate a crash between writing compact_3 and sweeping: a
    // stale batch dir below the floor reappears (its content is
    // already merged — queries ignore it, but disk leaks)
    val stale = new java.io.File(s"$dir/delta/batch_0")
    assert(stale.mkdir(), "stale dir should be re-creatable")
    java.nio.file.Files.write(stale.toPath.resolve("leftover"),
      "x".getBytes)
    val before = run(dir)
    // REPLAY of the consolidating batch: the compact is the single
    // visible root (the pre-fix early return leaked the stale dir
    // until the NEXT compaction); its completion marker gates an
    // idempotent sweep of the leftovers
    StreamBm25Refresh.applyBatch(docs.filter($"doc_id" < 0),
      "doc_id", "text", dir, 4L, compactEvery = 2)
    assert(!stale.exists(), "crash leftover below the floor must be swept")
    assert(run(dir) == before)
  }

  test("real foreachBatch stream over doc files == one-shot build") {
    val in = Files.createTempDirectory("sbm25_in").toString
    docs.filter($"doc_id" % 3 === 1).write.parquet(s"$in/b1")
    docs.filter($"doc_id" % 3 === 2).write.parquet(s"$in/b2")

    val dir = Files.createTempDirectory("sbm25_stream").toString
    Bm25Index.build(docs.filter($"doc_id" % 3 === 0), "doc_id", "text", dir)
    val schema = docs.schema
    val q = StreamBm25Refresh.start(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$in/*"),
      "doc_id", "text", dir,
      Files.createTempDirectory("sbm25_ck").toString)
    q.processAllAvailable(); q.stop()

    val fullDir = Files.createTempDirectory("sbm25_stream_full").toString
    Bm25Index.build(docs, "doc_id", "text", fullDir)
    assert(run(dir) == run(fullDir) && run(dir).nonEmpty)
  }
}

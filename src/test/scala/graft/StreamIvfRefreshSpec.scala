package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.streaming.StreamIvfRefresh

/** Streaming IVF index maintenance: per-batch delta dirs, replay
  * idempotence, pruned multi-root search parity, consolidation.
  */
class StreamIvfRefreshSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def search(dir: String, queries: org.apache.spark.sql.DataFrame) =
    IvfIndex.topKIndexed(spark, dir, queries, "vec_id", "embedding", k = 5, nProbe = 4)
      .select("query_id", "base_id", "rank").as[(Long, Long, Long)].collect().toSet

  test("save(half) + 2 streamed batches == save(full); replay adds nothing; pruning holds") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = e.filter($"vec_id" < 5)
    val model = IvfIndex.train(e, "vec_id", "embedding", numCentroids = 8, iters = 2)

    val fullDir = Files.createTempDirectory("sivf_full").toString
    IvfIndex.save(e, "vec_id", "embedding", model, fullDir)

    val streamDir = Files.createTempDirectory("sivf_inc").toString
    IvfIndex.save(e.filter($"vec_id" % 2 === 0), "vec_id", "embedding", model, streamDir)
    // two microbatches splitting the odd half
    StreamIvfRefresh.applyBatch(e.filter($"vec_id" % 4 === 1), "vec_id", "embedding",
      streamDir, 0L)
    StreamIvfRefresh.applyBatch(e.filter($"vec_id" % 4 === 3), "vec_id", "embedding",
      streamDir, 1L)

    val full = search(fullDir, queries)
    assert(search(streamDir, queries) == full && full.nonEmpty)

    // replayed microbatch overwrites its own delta dir: no duplicate
    // vectors, identical results
    val before = IvfIndex.listRoots(spark, streamDir)
      .map(spark.read.parquet(_)).reduce(_ unionByName _).count()
    StreamIvfRefresh.applyBatch(e.filter($"vec_id" % 4 === 3), "vec_id", "embedding",
      streamDir, 1L)
    val after = IvfIndex.listRoots(spark, streamDir)
      .map(spark.read.parquet(_)).reduce(_ unionByName _).count()
    assert(after == before)
    assert(search(streamDir, queries) == full)

    // multi-root search still prunes every root to the probed lists
    val plan = IvfIndex.topKIndexed(spark, streamDir, queries, "vec_id", "embedding",
      k = 5, nProbe = 4).queryExecution.executedPlan.toString
    val rootScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains(streamDir)).toSeq
    assert(rootScans.size >= 3, s"expected lists + 2 delta roots:\n$plan")
    assert(rootScans.forall(_.contains("PartitionFilters: [c")),
      s"an unpruned index root:\n${rootScans.mkString("\n")}")
  }

  test("long stream consolidates delta dirs; results and drift stats stay correct") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = e.filter($"vec_id" < 5)
    val model = IvfIndex.train(e, "vec_id", "embedding", numCentroids = 8, iters = 2)

    val dir = Files.createTempDirectory("sivf_compact").toString
    IvfIndex.save(e.filter($"vec_id" % 2 === 0), "vec_id", "embedding", model, dir)
    // 6 odd-id microbatches, consolidating every 2
    val stats = (0 until 6).map { b =>
      StreamIvfRefresh.applyBatch(e.filter($"vec_id" % 12 === 2 * b + 1),
        "vec_id", "embedding", dir, b.toLong, compactEvery = 2)
    }
    assert(stats.map(_.deltaRows).sum > 0)
    // same-distribution deltas must not advise retrain
    assert(stats.forall(!_.retrainAdvised))

    val deltaDirs = new java.io.File(s"$dir/delta").listFiles().map(_.getName)
    assert(deltaDirs.count(_.startsWith("batch_")) <= 2, deltaDirs.mkString(","))
    assert(deltaDirs.exists(_.startsWith("compact_")), deltaDirs.mkString(","))

    val fullDir = Files.createTempDirectory("sivf_compact_full").toString
    IvfIndex.save(e, "vec_id", "embedding", model, fullDir)
    assert(search(dir, queries) == search(fullDir, queries))
  }
}

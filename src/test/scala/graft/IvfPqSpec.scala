package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPqIndex, Similarity}

/** IVFADC composition ([[graft.operators.IvfPqIndex]]): recall vs
  * exact brute force, the coded-list storage contract (no float
  * vectors in the index), partition pruning on the probe path, and
  * the append-only refresh identity.
  */
class IvfPqSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def search(dir: String, nProbe: Int = 4) =
    IvfPqIndex.topK(spark, dir, emb.filter($"vec_id" < 20),
      "vec_id", "embedding", k = 5, nProbe = nProbe)

  test("recall@5 vs brute force; lists store codes only; probe prunes partitions") {
    val model = IvfPqIndex.train(emb, "vec_id", "embedding",
      numCentroids = 8, numSub = 8, codesPerSub = 64, iters = 2)
    val dir = Files.createTempDirectory("ivfpq").toString
    IvfPqIndex.save(emb, "vec_id", "embedding", model, dir)

    // the index is the codes: 8 tinyints per vector, no float column
    val lists = spark.read.parquet(s"$dir/lists")
    assert(lists.schema.fieldNames.toSet == Set("base_id", "codes", "c"),
      lists.schema.treeString)
    assert(lists.schema("codes").dataType.sql == "ARRAY<TINYINT>")

    val exact = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 20),
        "vec_id", "embedding", k = 5)
      .select("query_id", "base_id").as[(Long, Long)].collect().toSet
    val approx = search(dir)
    val got = approx.select("query_id", "base_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    // near-random synthetic vectors are PQ's worst case (the flat-PQ
    // spec's documented 0.25 floor in SessionizeIvfSpec); the coarse
    // pruning stage compounds on top, and the measured value here is
    // deterministic (hash-seeded init, fixed data) at 0.33 — ~130x
    // over the 5/2000 chance floor. The lossless-composition gate is
    // the probe-all == flat-PQ identity test below.
    assert(recall >= 0.25, s"IVFADC recall@5 too low: $recall")

    // probe must prune the coded inverted file to the probed partitions
    val plan = search(dir).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [c"),
      s"no partition pruning on coded lists:\n$plan")

    // model round-trips: same probes, same scores on reload
    val m2 = IvfPqIndex.load(spark, dir)
    assert(m2.ivf.centroids == model.ivf.centroids)
    assert(m2.pq.codebooks == model.pq.codebooks)
  }

  test("residual variant: reconstruction gain at equal code size; cosine-recall limit pinned; roundtrip + refresh parity") {
    // the by_residual regime: a corpus with real cluster structure —
    // push each vector strongly along one of 4 one-hot directions
    // chosen by vec_id, so the list mean explains most of each vector
    // and residuals concentrate near 0
    val clustered = emb.select($"vec_id",
      transform($"embedding",
        (x, i) => x.cast("double") +
          when(i === ($"vec_id" % 4) * 16, lit(6.0)).otherwise(lit(0.0)))
        .as("embedding"))
      .localCheckpoint(true)
    val vn = clustered.select($"vec_id".as("base_id"),
      transform($"embedding", x => x / sqrt(aggregate(
        transform($"embedding", y => y * y), lit(0.0), (a, b) => a + b)))
        .as("vn"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // end-to-end reconstruction MSE through the SAVED index: how well
    // shift + codebook[codes] reproduces v̂ (direct: shift = 0)
    def reconMse(byResidual: Boolean): (Double, String) = {
      val model = IvfPqIndex.train(clustered, "vec_id", "embedding",
        numCentroids = 8, numSub = 8, codesPerSub = 64, iters = 2,
        byResidual = byResidual)
      val dir = Files.createTempDirectory(s"ivfpq_res_$byResidual").toString
      IvfPqIndex.save(clustered, "vec_id", "embedding", model, dir)
      // variant + shifts persist with the index
      val loaded = IvfPqIndex.load(spark, dir)
      assert(loaded.byResidual == byResidual)
      if (byResidual) assert(loaded.shifts.size == 8)
      val lists = spark.read.parquet(s"$dir/lists").limit(800).collect()
      var tot = 0.0; var n = 0
      lists.foreach { r =>
        val id = r.getAs[Long]("base_id")
        val codes = r.getAs[scala.collection.Seq[Byte]]("codes")
        val c = r.getAs[Int]("c")
        val shift =
          if (byResidual) model.shifts(c)
          else Seq.fill(model.pq.numSub * model.pq.subDim)(0.0)
        val recon = (0 until model.pq.numSub).flatMap(s =>
          model.pq.codebooks(s)(codes(s).toInt))
        val v = vn(id)
        tot += v.indices.map { i =>
          val d = v(i) - (shift(i) + recon(i)); d * d }.sum
        n += 1
      }
      (tot / n, dir)
    }
    val (mseDirect, _) = reconMse(byResidual = false)
    val (mseResidual, resDir) = reconMse(byResidual = true)
    // the Jégou §V equal-code-size claim, measured: residual codes
    // reproduce the vector with LESS error than direct codes
    assert(mseResidual < mseDirect,
      s"residual recon MSE $mseResidual must beat direct $mseDirect")

    // the honest cosine-recall limit (see the operator scaladoc): the
    // reconstruction gain does NOT translate to cosine recall here —
    // normalized queries weight the coarse direction ~1 and the
    // discriminating dims ~1/|v| while k-means MSE is unweighted, so
    // direct spends codes exactly where queries look (the ScaNN
    // anisotropy observation; Faiss defaults by_residual=false for
    // IP). Pin: residual recall stays in the same band, no collapse.
    def recallOf(dirIdx: String): Double = {
      val exact = Similarity.bruteForceTopK(clustered,
          clustered.filter($"vec_id" < 20), "vec_id", "embedding", k = 5)
        .select("query_id", "base_id").as[(Long, Long)].collect().toSet
      val got = IvfPqIndex.topK(spark, dirIdx,
          clustered.filter($"vec_id" < 20),
          "vec_id", "embedding", k = 5, nProbe = 8)
        .select("query_id", "base_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val recallRes = recallOf(resDir)
    // measured 0.13 (deterministic) — 50x over the 5/2000 chance
    // floor, in the same band as direct's within-cluster recall
    assert(recallRes >= 0.1, s"residual cosine recall collapsed: $recallRes")

    // append-only refresh under the residual model == save(full)
    val model = IvfPqIndex.train(emb, "vec_id", "embedding",
      numCentroids = 8, numSub = 8, codesPerSub = 64, iters = 2,
      byResidual = true)
    val half = Files.createTempDirectory("ivfpq_res_half").toString
    IvfPqIndex.save(emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      model, half)
    IvfPqIndex.refresh(emb.filter($"vec_id" % 2 === 1), "vec_id",
      "embedding", half)
    val full = Files.createTempDirectory("ivfpq_res_full").toString
    IvfPqIndex.save(emb, "vec_id", "embedding", model, full)
    def rows(d: String) = search(d)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(rows(half) == rows(full) && rows(full).nonEmpty)
  }

  test("probing all lists == flat PQ over the same codes (pruning loses nothing)") {
    val model = IvfPqIndex.train(emb, "vec_id", "embedding",
      numCentroids = 8, numSub = 8, codesPerSub = 64, iters = 2)
    val dir = Files.createTempDirectory("ivfpq_all").toString
    IvfPqIndex.save(emb, "vec_id", "embedding", model, dir)
    val all = search(dir, nProbe = 8)
      .select("query_id", "base_id", "rank").as[(Long, Long, Long)].collect().toSet
    val flat = graft.operators.PqIndex.topK(
        spark.read.parquet(s"$dir/lists").select($"base_id".as("vec_id"), $"codes"),
        emb.filter($"vec_id" < 20), "vec_id", "embedding", model.pq, k = 5)
      .select("query_id", "base_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(all == flat && all.nonEmpty)
  }

  test("append-only refresh: save(half) + refresh(rest) == save(full)") {
    val model = IvfPqIndex.train(emb, "vec_id", "embedding",
      numCentroids = 8, numSub = 8, codesPerSub = 64, iters = 2)
    val fullDir = Files.createTempDirectory("ivfpq_full").toString
    IvfPqIndex.save(emb, "vec_id", "embedding", model, fullDir)
    val incDir = Files.createTempDirectory("ivfpq_inc").toString
    IvfPqIndex.save(emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      model, incDir)
    val appended = IvfPqIndex.refresh(emb.filter($"vec_id" % 2 =!= 0),
      "vec_id", "embedding", incDir)
    assert(appended > 0)
    def run(dir: String) = search(dir)
      .select("query_id", "base_id", "rank").as[(Long, Long, Long)].collect().toSet
    val full = run(fullDir)
    assert(run(incDir) == full && full.nonEmpty)
  }

  test("streamed batches == save(full); replay adds nothing; all roots pruned; consolidation") {
    import graft.streaming.StreamIvfPqRefresh
    val model = IvfPqIndex.train(emb, "vec_id", "embedding",
      numCentroids = 8, numSub = 8, codesPerSub = 64, iters = 2)
    val fullDir = Files.createTempDirectory("sivfpq_full").toString
    IvfPqIndex.save(emb, "vec_id", "embedding", model, fullDir)
    val dir = Files.createTempDirectory("sivfpq_inc").toString
    IvfPqIndex.save(emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      model, dir)
    assert(StreamIvfPqRefresh.applyBatch(emb.filter($"vec_id" % 4 === 1),
      "vec_id", "embedding", dir, 0L) > 0)
    assert(StreamIvfPqRefresh.applyBatch(emb.filter($"vec_id" % 4 === 3),
      "vec_id", "embedding", dir, 1L) > 0)
    def res(d: String) = search(d)
      .select("query_id", "base_id", "rank").as[(Long, Long, Long)].collect().toSet
    val full = res(fullDir)
    assert(res(dir) == full && full.nonEmpty)

    // replay rewrites its own delta root: same row count, same result
    val count0 = graft.operators.IvfIndex.listRoots(spark, dir)
      .map(spark.read.parquet(_)).reduce(_ unionByName _).count()
    StreamIvfPqRefresh.applyBatch(emb.filter($"vec_id" % 4 === 3),
      "vec_id", "embedding", dir, 1L)
    assert(graft.operators.IvfIndex.listRoots(spark, dir)
      .map(spark.read.parquet(_)).reduce(_ unionByName _).count() == count0)
    assert(res(dir) == full)

    // every root's scan pruned to the probed coarse lists
    val plan = search(dir).queryExecution.executedPlan.toString
    val rootScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains(dir)).toSeq
    assert(rootScans.size >= 3, s"expected lists + 2 delta roots:\n$plan")
    assert(rootScans.forall(_.contains("PartitionFilters: [c")),
      s"an unpruned root:\n${rootScans.mkString("\n")}")

    // consolidation bounds the root count and preserves results
    val cDir = Files.createTempDirectory("sivfpq_compact").toString
    IvfPqIndex.save(emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
      model, cDir)
    (0 until 6).foreach { b =>
      StreamIvfPqRefresh.applyBatch(emb.filter($"vec_id" % 12 === 2 * b + 1),
        "vec_id", "embedding", cDir, b.toLong, compactEvery = 2)
    }
    val deltaDirs = new java.io.File(s"$cDir/delta").listFiles().map(_.getName)
    assert(deltaDirs.count(_.startsWith("batch_")) <= 2, deltaDirs.mkString(","))
    assert(deltaDirs.exists(_.startsWith("compact_")), deltaDirs.mkString(","))
    assert(res(cDir) == full)
  }

  test("contract query ann_ivfpq returns k rows per probe query") {
    val df = SparkEntry.queries("ann_ivfpq")(spark, sfDir)
    val perQuery = df.groupBy("query_id").count().select("count")
      .as[Long].collect()
    assert(perQuery.nonEmpty && perQuery.forall(_ == 5L), perQuery.toSeq.toString)
  }
}

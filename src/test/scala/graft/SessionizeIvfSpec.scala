package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Similarity}
import graft.streaming.Sessionize

class SessionizeIvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("streaming sessionization matches batch windows for closed sessions") {
    // typed event stream from the events table, split into two
    // chronological batches (cross-batch order per user preserved)
    val ev = graft.sources.TableCatalog.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"value")
    val split = lit("2024-01-15 00:00:00").cast("timestamp")
    val dir = Files.createTempDirectory("sess").toString
    ev.filter($"ts" < split).write.parquet(s"$dir/b1")
    ev.filter($"ts" >= split).write.parquet(s"$dir/b2")

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
      .as[Sessionize.SessionEvent]
    val got = Sessionize.runToMemory(spark,
        Sessionize.sessions(stream, gapSeconds = 1800), "sess_test")
      .collect().map(s => (s.user_id, s.session_no, s.n_events, s.sum_value))
      .toSet

    // batch truth: q17-style window sessionization, minus each user's
    // LAST session (still open in the stream, intentionally unemitted)
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val sess = ev
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_sess", when($"prev_us".isNull ||
        unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_no", sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_no")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
    val maxSess = sess.groupBy($"user_id").agg(max($"session_no").as("last_no"))
    val want = sess.join(maxSess, "user_id")
      .filter($"session_no" < $"last_no")
      .select($"user_id", $"session_no", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2, t._3, math.round(t._4 * 100) / 100.0)).toSet

    val gotRounded = got.map(t => (t._1, t._2, t._3, math.round(t._4 * 100) / 100.0))
    assert(gotRounded.nonEmpty)
    assert(gotRounded == want)
  }

  test("event-time timeout flushes idle sessions once the watermark passes") {
    import org.apache.spark.sql.functions.{col, expr}
    val dir = Files.createTempDirectory("sesstimeout").toString
    import spark.implicits._
    // user 1: two events at t0; user 2: one event 10 hours later.
    // After batch 2 advances the watermark, user 1's session (idle
    // past the 30-min gap) must flush via timeout; user 2's stays open.
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:05:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    Seq((1L, 1L, t0, 1.0), (1L, 2L, t1, 2.0)).toDF("user_id", "event_id", "ts", "value")
      .write.parquet(s"$dir/in/b1")
    Seq((2L, 3L, t2, 9.0)).toDF("user_id", "event_id", "ts", "value")
      .write.parquet(s"$dir/in/b2")
    val schema = spark.read.parquet(s"$dir/in/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/*")
      .withWatermark("ts", "10 minutes")
      .as[Sessionize.SessionEvent]
    val got = Sessionize.runToMemory(spark,
        Sessionize.sessionsWithTimeout(stream, gapSeconds = 1800), "sess_timeout")
      .collect()
    assert(got.map(_.user_id).toSet == Set(1L), s"only user 1 should flush: ${got.toSeq}")
    val s1 = got.head
    assert(s1.n_events == 2 && math.abs(s1.sum_value - 3.0) < 1e-9)
  }

  test("full replay with timeout flush equals the batch q17 sessionization exactly") {
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"user_id", $"session_no", $"n_events",
        date_format($"session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s"),
        date_format($"session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("e"),
        round($"sum_value", 2).as("v"))
      .as[(Long, Long, Long, String, String, Double)].collect().toSet
    val got = norm(SparkEntry.queries("q_stream_sessionize")(spark, sfDir))
    val want = norm(SparkEntry.queries("q17_sessionize")(spark, sfDir))
    assert(got.nonEmpty)
    assert(got == want, s"stream != batch; only-stream=${(got -- want).take(3)} " +
      s"only-batch=${(want -- got).take(3)}")
  }

  test("IVF index persists: saved-index search == fresh search, scan prunes to probed lists") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = e.filter($"vec_id" < 5)
    val model = IvfIndex.train(e, "vec_id", "embedding", numCentroids = 8, iters = 2)
    val dir = Files.createTempDirectory("ivf").toString
    IvfIndex.save(e, "vec_id", "embedding", model, dir)

    // model round-trips exactly
    assert(IvfIndex.load(spark, dir).centroids == model.centroids)

    val fresh = IvfIndex.topK(e, queries, "vec_id", "embedding", model, k = 5, nProbe = 4)
      .select("query_id", "base_id", "rank").as[(Long, Long, Long)].collect().toSet
    val indexed = IvfIndex.topKIndexed(spark, dir, queries, "vec_id", "embedding",
      k = 5, nProbe = 4)
    val got = indexed.select("query_id", "base_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(got == fresh && got.nonEmpty)

    // probing must prune the inverted file to the probed partitions
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [c"), s"no partition pruning on lists:\n$plan")
  }

  test("BM25 index: indexed query == direct bm25TopK, postings pruned") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val probes = Seq(1L -> "spark table join", 2L -> "hash merge sort")
    val dir = Files.createTempDirectory("bm25idx").toString
    graft.operators.Bm25Index.build(docs, "doc_id", "text", dir)
    val indexed = graft.operators.Bm25Index.query(spark, dir, probes, k = 5)
    val got = indexed.select(col("query_id"), col("doc"), col("rank"),
        col("bm25")).as[(Long, Long, Long, Double)].collect().toSet
    val direct = graft.operators.TextAnalysis
      .bm25TopK(docs, "doc_id", "text", probes, k = 5)
      .select(col("query_id"), col("doc_id"), col("rank"), col("bm25"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === direct && got.nonEmpty)
    // probing must prune the posting file to the probed term buckets
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [b"),
      s"no partition pruning on postings:\n$plan")
  }

  test("BM25 index refresh: build(half) + refresh(rest) == build(full)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val probes = Seq(1L -> "spark table join", 2L -> "window agg stream")
    val fullDir = Files.createTempDirectory("bm25full").toString
    graft.operators.Bm25Index.build(docs, "doc_id", "text", fullDir)
    val incDir = Files.createTempDirectory("bm25inc").toString
    graft.operators.Bm25Index.build(docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", incDir)
    val appended = graft.operators.Bm25Index.refresh(
      docs.filter($"doc_id" % 2 === 1), "doc_id", "text", incDir)
    assert(appended > 0)
    def run(dir: String) = graft.operators.Bm25Index
      .query(spark, dir, probes, k = 5)
      .select(col("query_id"), col("doc"), col("rank"), col("bm25"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val full = run(fullDir)
    assert(run(incDir) === full && full.nonEmpty)
  }

  test("IVF incremental refresh: save(half) + refresh(rest) == save(full)") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = e.filter($"vec_id" < 5)
    val model = IvfIndex.train(e, "vec_id", "embedding", numCentroids = 8, iters = 2)

    val fullDir = Files.createTempDirectory("ivf_full").toString
    IvfIndex.save(e, "vec_id", "embedding", model, fullDir)

    val incDir = Files.createTempDirectory("ivf_inc").toString
    IvfIndex.save(e.filter($"vec_id" % 2 === 0), "vec_id", "embedding", model, incDir)
    IvfIndex.refresh(e.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding", incDir)

    def search(dir: String) =
      IvfIndex.topKIndexed(spark, dir, queries, "vec_id", "embedding", k = 5, nProbe = 4)
        .select("query_id", "base_id", "rank").as[(Long, Long, Long)].collect().toSet
    val full = search(fullDir)
    val refreshed = search(incDir)
    assert(refreshed == full && refreshed.nonEmpty)

    // refreshed index still prunes to probed partitions
    val plan = IvfIndex.topKIndexed(spark, incDir, queries, "vec_id", "embedding",
      k = 5, nProbe = 4).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [c"), s"no partition pruning after refresh:\n$plan")
  }

  test("IVF refresh drift guard: same-shape delta passes, shifted delta flags retrain") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model = IvfIndex.train(e, "vec_id", "embedding", numCentroids = 8, iters = 2)
    val dir = Files.createTempDirectory("ivf_drift").toString
    IvfIndex.save(e.filter($"vec_id" % 2 === 0), "vec_id", "embedding", model, dir)

    // delta drawn from the same corpus: distribution shape preserved
    val same = IvfIndex.refresh(e.filter($"vec_id" % 2 =!= 0), "vec_id", "embedding", dir)
    assert(same.deltaRows > 0)
    assert(same.drift < 0.5, s"same-distribution delta reported drift ${same.drift}")
    assert(!same.retrainAdvised)

    // delta collapsed onto ONE existing vector's direction: every
    // assignment lands in a single list — maximal distribution shift
    val seedVec = e.filter($"vec_id" === 0).select($"embedding").collect()(0)
      .getSeq[Float](0)
    val skewDir = Files.createTempDirectory("ivf_drift_skew").toString
    IvfIndex.save(e.filter($"vec_id" % 2 === 0), "vec_id", "embedding", model, skewDir)
    val skewDelta = spark.range(100000, 100200).toDF("vec_id")
      .withColumn("embedding", typedLit(seedVec))
    val skew = IvfIndex.refresh(skewDelta, "vec_id", "embedding", skewDir)
    assert(skew.drift > 0.5, s"single-list delta reported drift ${skew.drift}")
    assert(skew.retrainAdvised, "shifted delta must flag a retrain")
    assert(skew.drift > same.drift)
  }

  test("IVF ANN: trained centroids partition the corpus; probes recall brute-force hits") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = e.filter($"vec_id" < 5)
    val model = IvfIndex.train(e, "vec_id", "embedding", numCentroids = 8, iters = 2)
    assert(model.centroids.size == 8)
    assert(model.centroids.forall(_.size == 64))

    val ivf = IvfIndex.topK(e, queries, "vec_id", "embedding", model, k = 5, nProbe = 4)
      .select("query_id", "base_id").as[(Long, Long)].collect()
    assert(ivf.nonEmpty)
    assert(ivf.groupBy(_._1).forall(_._2.length <= 5))

    // recall vs exact brute force top-5: probing half the lists on a
    // loosely-clustered corpus should still recover most true hits
    val brute = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "base_id").as[(Long, Long)].collect().toSet
    val recall = ivf.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.4, s"IVF recall too low: $recall")
  }

  test("PQ ANN: codes are numSub bytes; exact on a codebook-sized corpus; recall on real one") {
    import graft.operators.PqIndex
    // a corpus with <= codesPerSub distinct subvector patterns per
    // subspace is representable EXACTLY: every vector reconstructs to
    // itself, so PQ top-k must equal brute-force top-k bit-for-bit
    val dims = 8
    def vec(group: Int, member: Int): Array[Float] = {
      val v = Array.fill(dims)(0.1f)
      v(group * 2) = 1.0f + 0.25f * member
      v
    }
    val rows = for (g <- 0 until 4; m <- 0 until 4)
      yield (g * 10L + m, vec(g, m))
    val tiny = rows.toDF("vec_id", "embedding")
    val tinyModel = PqIndex.train(tiny, "vec_id", "embedding",
      numSub = 4, codesPerSub = 16, iters = 3)
    val enc = PqIndex.encode(tiny, "vec_id", "embedding", tinyModel)
    // stored form: numSub tinyint codes per vector
    assert(enc.schema("codes").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, false) ||
      enc.schema("codes").dataType.simpleString.startsWith("array<tinyint>"),
      enc.schema("codes").dataType.simpleString)
    assert(enc.select(max(size(col("codes")))).head().getInt(0) == 4)
    val q = tiny.filter($"vec_id" < 10)
    val pq = PqIndex.topK(enc, q, "vec_id", "embedding", tinyModel, k = 3)
      .select("query_id", "base_id").as[(Long, Long)].collect().toSet
    val bf = Similarity.bruteForceTopK(tiny, q, "vec_id", "embedding", k = 3)
      .select("query_id", "base_id").as[(Long, Long)].collect().toSet
    assert(pq == bf, s"exactly-representable corpus must match brute force: $pq vs $bf")

    // real corpus: 32x compression (64 floats -> 8 bytes) still
    // recovers a usable fraction of the true top-5
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = e.filter($"vec_id" < 5)
    val model = PqIndex.train(e, "vec_id", "embedding",
      numSub = 8, codesPerSub = 64, iters = 3)
    assert(model.codebooks.size == 8 && model.subDim == 8)
    val encoded = PqIndex.encode(e, "vec_id", "embedding", model)
    val got = PqIndex.topK(encoded, queries, "vec_id", "embedding", model, k = 5)
      .select("query_id", "base_id").as[(Long, Long)].collect()
    assert(got.groupBy(_._1).forall(_._2.length <= 5))
    val brute = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "base_id").as[(Long, Long)].collect().toSet
    // near-random synthetic vectors are PQ's worst case (neighbors
    // separated by ~0.05 cosine, quantization noise comparable);
    // 0.25+ is ~100x over the 5/2000 chance floor
    val recall = got.count(brute.contains).toDouble / brute.size
    assert(recall >= 0.25, s"PQ recall too low: $recall")

    // persisted model round-trips and searches identically
    val dir = java.nio.file.Files.createTempDirectory("pq_model").toString
    PqIndex.saveModel(spark, model, dir)
    val loaded = PqIndex.loadModel(spark, dir)
    assert(loaded == model)
    val again = PqIndex.topK(encoded, queries, "vec_id", "embedding", loaded, k = 5)
      .select("query_id", "base_id").as[(Long, Long)].collect().toSet
    assert(again == got.toSet)
  }
}

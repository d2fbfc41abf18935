package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Cms
import graft.streaming.StreamSketch

class StreamSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("streamsketch").toString

  private def batchOf(rows: (String, String)*): DataFrame =
    rows.toDF("k", "v")

  private def estimateMap(spark0: org.apache.spark.sql.SparkSession,
                          root: String, items: Seq[String]): Map[(String, String), Long] =
    StreamSketch.estimates(spark0, root, Seq("k"),
        items.toDF("item"), "item")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("incremental CMS rollup == one-shot batch sketch; replay idempotent") {
    val root = tmp()
    val b0 = batchOf("a" -> "x", "a" -> "x", "b" -> "y")
    val b1 = batchOf("a" -> "y", "b" -> "y", "b" -> "y")
    val b2 = batchOf("a" -> "x", "b" -> "z")
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      StreamSketch.applyBatch(spark, b, root, i, Seq("k"), col("v"))
    }
    val items = Seq("x", "y", "z", "missing")
    val got = estimateMap(spark, root, items)

    val oneShot = b0.union(b1).union(b2)
      .groupBy("k").agg(Cms.sketch(col("v")).as("sk"))
      .crossJoin(broadcast(items.toDF("item")))
      .select(col("k"), col("item"), Cms.estimate(col("sk"), col("item")))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == oneShot)
    // tiny data, no collisions: estimates are the exact counts
    assert(got(("a", "x")) == 3L && got(("b", "y")) == 3L &&
      got(("b", "z")) == 1L && got(("a", "missing")) == 0L)

    // replaying an already-applied batch must not double-count
    StreamSketch.applyBatch(spark, b1, root, 1, Seq("k"), col("v"))
    assert(estimateMap(spark, root, items) == got)
  }

  test("consolidation folds dirs by sketch union: bounded dirs, unchanged estimates") {
    val root = tmp()
    val perBatch = (0 until 10).map { i =>
      batchOf("a" -> s"v${i % 3}", "b" -> s"v${i % 2}")
    }
    perBatch.zipWithIndex.foreach { case (b, i) =>
      StreamSketch.applyBatch(spark, b, root, i, Seq("k"), col("v"),
        consolidateEvery = 4)
    }
    def dirNames = new java.io.File(root).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirNames.count(_.startsWith("batch_")) <= 4,
      dirNames.mkString(","))
    assert(dirNames.exists(_.startsWith("compact_")), dirNames.mkString(","))

    val items = Seq("v0", "v1", "v2")
    val got = estimateMap(spark, root, items)
    val oneShot = perBatch.reduce(_ union _)
      .groupBy("k").agg(Cms.sketch(col("v")).as("sk"))
      .crossJoin(broadcast(items.toDF("item")))
      .select(col("k"), col("item"), Cms.estimate(col("sk"), col("item")))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == oneShot)

    // replaying the consolidating batch re-runs only the idempotent sweep
    StreamSketch.applyBatch(spark, perBatch(8), root, 8, Seq("k"), col("v"),
      consolidateEvery = 4)
    assert(estimateMap(spark, root, items) == got)
  }

  test("real stream: foreachBatch-driven sketch state equals the one-shot, survives restart") {
    val work = java.nio.file.Files.createTempDirectory("ss_e2e").toString
    val root = s"$work/state"
    val all = (0 until 300).map(i => ("k" + (i % 2), "v" + (i % 7)))
    // three files = three micro-batches
    (0 until 3).foreach { p =>
      all.filter(t => math.floorMod(t._2.hashCode, 3) == p).toDF("k", "v")
        .write.parquet(s"$work/in/part=$p")
    }
    val schema = all.take(1).toDF("k", "v").schema
    def runStream(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
      val q = stream.writeStream
        .option("checkpointLocation", s"$work/ck")
        .foreachBatch { (b: DataFrame, id: Long) =>
          StreamSketch.applyBatch(spark, b, root, id, Seq("k"), col("v"),
            consolidateEvery = 2)
        }.start()
      q.processAllAvailable(); q.stop()
    }
    runStream()
    // restart against the same checkpoint: nothing new → state unchanged
    runStream()
    val items = (0 until 7).map("v" + _)
    val got = estimateMap(spark, root, items)
    val oneShot = all.toDF("k", "v")
      .groupBy("k").agg(Cms.sketch(col("v")).as("sk"))
      .crossJoin(broadcast(items.toDF("item")))
      .select(col("k"), col("item"), Cms.estimate(col("sk"), col("item")))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == oneShot && got.values.sum >= 300)
  }

  test("GK plug-in: streaming quantile state matches the one-shot bound") {
    import graft.plans.Gk
    val root = tmp()
    // 4 batches of 250 values each: a deterministic scramble of 0..999
    val batches = (0 until 4).map { b =>
      (0 until 250).map { j =>
        val v = (b * 250 + j) * 611 % 1000
        ("k", v.toDouble)
      }.toDF("k", "v")
    }
    batches.zipWithIndex.foreach { case (df, i) =>
      StreamSketch.applyBatch(spark, df, root, i, Seq("k"), col("v"),
        build = Gk.sketch(_), union = Gk.union(_), consolidateEvery = 2)
    }
    val est = StreamSketch.state(spark, root, Seq("k"), Gk.union(_))
      .select(Gk.quantile(col(StreamSketch.SketchCol), lit(0.5)))
      .as[Double].head()
    // 1000 distinct values 0..999: the true median is ~500; the GK
    // bound at eps=0.01 over a 4-way merge tree allows ±(0.01*1000+1)
    assert(math.abs(est - 500.0) <= 25.0, s"median estimate $est")
  }

  test("streaming expectations: per-batch reports, attributable failures, replay idempotent") {
    import graft.operators.Expectations._
    import graft.streaming.StreamExpectations
    val root = tmp()
    val checks = Seq(NotNull("v"), InRange("n", 0, 100))
    val b0 = Seq(("a", 5L), ("b", 50L)).toDF("v", "n")
    val b1 = Seq(("c", 500L), (null.asInstanceOf[String], 7L))
      .toDF("v", "n") // the bad batch: one null, one out-of-range
    val b2 = Seq(("d", 1L)).toDF("v", "n")
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      StreamExpectations.applyBatch(spark, b, root, i, checks,
        consolidateEvery = 2)
    }
    val sum0 = StreamExpectations.summary(spark, root)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(sum0("not_null(v)") == (("not_null(v)", 1L, 3L, 1L, false)))
    assert(sum0("in_range(n,0.0,100.0)") ==
      (("in_range(n,0.0,100.0)", 1L, 3L, 1L, false)))
    // the failure is attributable to batch 1
    val failing = StreamExpectations.reports(spark, root)
      .filter(!col("passed")).select("batch_id").distinct()
      .as[Long].collect().toSeq
    assert(failing == Seq(1L))
    // replay of the bad batch overwrites, never double-reports
    StreamExpectations.applyBatch(spark, b1, root, 1, checks,
      consolidateEvery = 2)
    val sum1 = StreamExpectations.summary(spark, root)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(sum1 == sum0)
  }

  test("frequent-items plug-in: streaming heavy-hitter state == one-shot (exact regime)") {
    import graft.plans.Freq
    val root = tmp()
    val batches = (0 until 4).map { i =>
      (0 until 200).map(j => ("g" + (j % 2), "w" + (i * 7 + j) % 13))
        .toDF("k", "v")
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamSketch.applyBatch(spark, b, root, i, Seq("k"), col("v"),
        build = Freq.sketch(_), union = Freq.union(_), consolidateEvery = 2)
    }
    val items = (0 until 13).map("w" + _)
    val got = StreamSketch.estimates(spark, root, Seq("k"),
        items.toDF("item"), "item",
        union = Freq.union(_), estimate = Freq.estimate(_, _))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val oneShot = batches.reduce(_ union _)
      .groupBy("k").agg(Freq.sketch(col("v")).as("sk"))
      .crossJoin(broadcast(items.toDF("item")))
      .select(col("k"), col("item"), Freq.estimate(col("sk"), col("item")))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // 13-item vocab never purges: streaming rollup is exactly the
    // one-shot, which is exactly the true counts
    assert(got == oneShot && got.values.sum == 800)
  }

  test("theta plug-in: streaming segment sketches answer set algebra across groups") {
    import graft.plans.Theta
    val root = tmp()
    // two segments fed incrementally: users 0-599 hit segment A over
    // batches, users 300-899 hit segment B — overlap is 300-599
    val batches = (0 until 3).map { i =>
      ((0 until 200).map(j => ("A", (i * 200 + j).toLong)) ++
        (0 until 200).map(j => ("B", (300 + i * 200 + j).toLong)))
        .toDF("k", "v")
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamSketch.applyBatch(spark, b, root, i, Seq("k"), col("v"),
        build = Theta.sketch(_), union = Theta.union(_), consolidateEvery = 2)
    }
    val state = StreamSketch.state(spark, root, Seq("k"), Theta.union(_))
    val byK = state.select(col("k"), col(StreamSketch.SketchCol))
      .as[(String, Array[Byte])].collect().toMap
    val row = state.agg(
      Theta.estimate(Theta.intersect(
        first(when(col("k") === "A", col(StreamSketch.SketchCol)), true),
        first(when(col("k") === "B", col(StreamSketch.SketchCol)), true)))
        .as("both"))
      .as[Long].head()
    // exact regime (600 distinct per side << nominal entries):
    // the streamed rollup answers the overlap exactly
    assert(row == 300L, s"intersection $row")
    assert(byK.keySet == Set("A", "B"))
    // replay adds nothing
    StreamSketch.applyBatch(spark, batches(1), root, 1, Seq("k"), col("v"),
      build = Theta.sketch(_), union = Theta.union(_), consolidateEvery = 2)
    val again = StreamSketch.state(spark, root, Seq("k"), Theta.union(_))
      .select(Theta.estimate(col(StreamSketch.SketchCol)))
      .as[Long].collect().sorted.toSeq
    assert(again == Seq(600L, 600L), again.toString)
  }

  test("sketch family is pluggable: HLL distinct-count rollup == one-shot") {
    val root = tmp()
    val batches = (0 until 4).map { i =>
      (0 until 50).map(j => ("g" + (j % 2), s"u${i * 37 + j}")).toDF("k", "v")
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamSketch.applyBatch(spark, b, root, i, Seq("k"), col("v"),
        build = hll_sketch_agg(_, lit(12)),
        union = hll_union_agg(_),
        consolidateEvery = 2)
    }
    val got = StreamSketch.state(spark, root, Seq("k"), hll_union_agg(_))
      .select(col("k"),
        hll_sketch_estimate(col(StreamSketch.SketchCol)).as("n"))
      .as[(String, Long)].collect().toMap
    val oneShot = batches.reduce(_ union _)
      .groupBy("k").agg(hll_sketch_estimate(
        hll_sketch_agg(col("v"), lit(12))).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == oneShot && got.values.sum > 150)
  }

  test("sketch family is pluggable: Gram moments stream in, PCA model out") {
    import graft.plans.Gram
    import graft.operators.EmbedPca
    val root = tmp()
    // integer-valued vectors: double sums are exact, so the streamed
    // rollup must equal the one-shot moments BIT-FOR-BIT
    def vec(i: Int) = Array(i.toFloat, (i % 7).toFloat, (i % 3).toFloat)
    val batches = (0 until 3).map { b =>
      (0 until 40).map(j => ("all", vec(b * 40 + j))).toDF("k", "v")
    }
    batches.zipWithIndex.foreach { case (df, i) =>
      StreamSketch.applyBatch(spark, df, root, i, Seq("k"), col("v"),
        build = Gram.moments(_, 3), union = Gram.union(_, 3),
        consolidateEvery = 2)
    }
    val streamed = StreamSketch.state(spark, root, Seq("k"), Gram.union(_, 3))
      .select(col(StreamSketch.SketchCol)).head().getSeq[Double](0).toArray
    val oneShot = batches.reduce(_ union _)
      .agg(Gram.moments(col("v"), 3)).head().getSeq[Double](0).toArray
    assert(streamed.toSeq == oneShot.toSeq)
    // the streamed state IS a PCA fit: model from streamed moments ==
    // model from a batch fit over the concatenated corpus
    val mStream = EmbedPca.fromMoments(streamed, k = 2, dim = 3)
    val mBatch = EmbedPca.fit(batches.reduce(_ union _), "v", k = 2, dim = 3)
    assert(mStream.eigenvalues.toSeq == mBatch.eigenvalues.toSeq)
    assert(mStream.n == 120L)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("hash split is a deterministic partition with the right proportions") {
    val (train, test) = Sampling.hashSplit(docs, "doc_id", testFraction = 0.2)
    val n = docs.count().toDouble
    val nTest = test.count().toDouble
    // exact partition: no overlap, nothing lost
    assert(train.count() + nTest == n)
    assert(train.join(test, "doc_id").count() == 0)
    // proportion within sampling tolerance
    assert(math.abs(nTest / n - 0.2) < 0.08, s"test fraction ${nTest / n}")
    // deterministic: same ids every time
    val (_, test2) = Sampling.hashSplit(docs, "doc_id", testFraction = 0.2)
    assert(test.select("doc_id").as[Long].collect().toSet ==
      test2.select("doc_id").as[Long].collect().toSet)
  }

  test("stratified sample respects per-stratum fractions") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 1.0), defaultFraction = 0.0)
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.keySet == Set("en", "de"), s"unlisted strata must drop: $byLang")
    assert(byLang("de") == totals("de"), "fraction 1.0 keeps the whole stratum")
    val enFrac = byLang("en").toDouble / totals("en")
    assert(math.abs(enFrac - 0.5) < 0.15, s"en fraction $enFrac")
  }

  test("exact stratified sample hits floor(frac*n) in EVERY stratum, deterministically") {
    import graft.operators.Sampling
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"lang")
    val totals = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedSampleExact(docs, "doc_id", "lang", 0.25)
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    totals.foreach { case (lang, n) =>
      assert(byLang.getOrElse(lang, 0L) == n / 4,
        s"stratum $lang: expected exactly ${n / 4} of $n, got ${byLang.getOrElse(lang, 0L)}")
    }
    // deterministic: same selection under a different physical layout
    val again = Sampling.stratifiedSampleExact(docs.repartition(13), "doc_id", "lang", 0.25)
    assert(again.select("doc_id").as[Long].collect().toSet ==
      sampled.select("doc_id").as[Long].collect().toSet)
  }

  test("weighted sample: deterministic, layout-invariant, heap-based plan") {
    val docs = (1L to 200L).map(i => (i, if (i <= 100) 8.0 else 1.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(docs, "id", "w", k = 30)
    val got = s1.select("id").as[Long].collect().toSet
    assert(got.size == 30)
    assert(got == Sampling.weightedSample(docs.repartition(7), "id", "w", 30)
      .select("id").as[Long].collect().toSet)
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"must heap-select, not sort:\n$plan")
  }

  test("weighted sample: inclusion tracks weight; non-positive weights excluded") {
    val docs = (1L to 200L).map(i =>
      (i, if (i <= 100) 8.0 else 1.0)).toDF("id", "w")
    val picks = (1 to 20).flatMap { s =>
      Sampling.weightedSample(docs, "id", "w", k = 30, salt = s"s$s")
        .select("id").as[Long].collect()
    }
    val heavy = picks.count(_ <= 100L)
    val light = picks.size - heavy
    // 8x weight at k=30/200: heavy rows dominate every draw
    assert(heavy > 3 * light, s"heavy=$heavy light=$light")

    val withBad = docs.withColumn("w",
      org.apache.spark.sql.functions.when($"id" % 5 === 0,
        org.apache.spark.sql.functions.lit(-1.0)).otherwise($"w"))
    val cleaned = Sampling.weightedSample(withBad, "id", "w", 50)
      .select("id").as[Long].collect()
    assert(cleaned.forall(_ % 5 != 0))
  }

  test("DSIR importance: target-slice docs score higher; resampling overselects them") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dsir
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = Dsir.importanceScores(docs, "doc_id", "text",
      col("lang") === "en")
    // weight model is bounded by the bucket count — broadcastable
    val weights = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en")
    assert(weights.count() <= Dsir.DefaultBuckets)
    val byLang = scored.join(docs.select("doc_id", "lang"), "doc_id")
    val means = byLang.groupBy((col("lang") === "en").as("is_en"))
      .agg(avg("score").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(means(true) > means(false) + 0.5,
      s"en mean ${means(true)} not separated from ${means(false)}")
    // importance resampling: the en fraction among the selected k
    // exceeds the corpus en fraction (scores -> exp weights)
    val k = 50
    val sel = Dsir.resample(byLang, "doc_id", k)
    val selEn = sel.where(col("lang") === "en").count().toDouble / k
    val corpusEn = docs.where(col("lang") === "en").count().toDouble /
      docs.count()
    assert(sel.count() == k)
    assert(selEn > corpusEn + 0.1,
      s"selected en fraction $selEn vs corpus $corpusEn")
    // deterministic: same inputs, same selection
    val again = Dsir.resample(byLang, "doc_id", k)
      .select("doc_id").as[Long].collect().toSet
    assert(again == sel.select("doc_id").as[Long].collect().toSet)
  }

  test("mixture sample hits the exact integer quotas at every temperature") {
    val d = docs.select($"doc_id", $"source")
    val counts = d.groupBy("source").count().as[(String, Long)].collect().toMap
    // independent quota recomputation: same sqrt chain, BigInt algebra
    def expectQuotas(alphaQ: Int): Map[String, Long] = {
      def powA(x: Double): Double = alphaQ match {
        case 0 => 1.0
        case 1 => math.sqrt(math.sqrt(x))
        case 2 => math.sqrt(x)
        case 3 => math.sqrt(x) * math.sqrt(math.sqrt(x))
        case 4 => x
      }
      val w = counts.map { case (s, n) =>
        s -> BigInt(math.floor(powA(n.toDouble) * 1000000.0).toLong) }
      val sw = w.values.sum
      val budget = BigInt(counts.values.sum) / 4
      counts.map { case (s, n) =>
        s -> (budget * w(s) / sw).min(BigInt(n)).toLong }
    }
    for (alphaQ <- Seq(0, 2, 4)) {
      val got = Sampling.mixtureSample(d, "doc_id", "source",
          alphaQ, budgetNum = 1, budgetDen = 4)
        .groupBy("source").count().as[(String, Long)].collect().toMap
      val want = expectQuotas(alphaQ).filter(_._2 > 0)
      assert(got == want, s"alphaQuarters=$alphaQ: $got != $want")
    }
  }

  test("mixture sample: lower temperature exponent flattens the mix; selection is layout-invariant") {
    // skewed synthetic mix: the corpus tables are near-uniform by
    // source, where temperature is (by design) a no-op
    val skewed = ((1L to 800L).map(i => (i, "big")) ++
      (1001L to 1050L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    def shares(alphaQ: Int): Map[String, Double] = {
      val m = Sampling.mixtureSample(skewed, "doc_id", "source", alphaQ, 1, 4)
        .groupBy("source").count().as[(String, Long)].collect().toMap
      val tot = m.values.sum.toDouble
      m.view.mapValues(_ / tot).toMap
    }
    val smallest = "small"
    val s0 = shares(0); val s4 = shares(4)
    val d = docs.select($"doc_id", $"source")
    // α=0 gives the smallest source a strictly larger share of the
    // budget than proportional sampling does
    assert(s0(smallest) > s4.getOrElse(smallest, 0.0),
      s"α=0 share ${s0(smallest)} vs α=1 share ${s4.getOrElse(smallest, 0.0)}")
    // layout invariance: selection identical after an adversarial shuffle
    val sel = Sampling.mixtureSample(d, "doc_id", "source", 2, 1, 4)
      .select("doc_id").as[Long].collect().toSet
    val selRepart = Sampling.mixtureSample(
        d.repartition(17, $"source"), "doc_id", "source", 2, 1, 4)
      .select("doc_id").as[Long].collect().toSet
    assert(sel == selRepart)
  }
}

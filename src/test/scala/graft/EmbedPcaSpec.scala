package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EmbedPca
import graft.plans.Gram

class EmbedPcaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("gram moments: exact on integer vectors, partial/final and union compose") {
    // integer-valued floats sum exactly in doubles -> bit-equality holds
    val vecs = (1 to 40).map(i =>
      (i.toLong, Array(i.toFloat, (i % 7).toFloat, (i % 3).toFloat)))
    val df = vecs.toDF("id", "v")
    val state = df.agg(Gram.moments($"v", 3)).head().getSeq[Double](0).toArray
    val exp = new Array[Double](Gram.stateLen(3))
    vecs.foreach { case (_, v) =>
      exp(0) += 1
      for (i <- 0 until 3) exp(1 + i) += v(i)
      var idx = 4
      for (i <- 0 until 3; j <- i until 3) { exp(idx) += v(i).toDouble * v(j); idx += 1 }
    }
    assert(state.toSeq == exp.toSeq)
    // layout invariance (exact for integer-valued inputs)
    val state17 = df.repartition(17).agg(Gram.moments($"v", 3))
      .head().getSeq[Double](0).toArray
    assert(state17.toSeq == exp.toSeq)
    // mergeable rollup: per-half moments united == one-shot moments
    val halves = df.withColumn("h", $"id" % 2)
      .groupBy("h").agg(Gram.moments($"v", 3).as("m"))
    val united = halves.agg(Gram.union($"m", 3)).head().getSeq[Double](0).toArray
    assert(united.toSeq == exp.toSeq)
    // cross-dimension union refuses
    val bad = intercept[Exception] {
      halves.agg(Gram.union($"m", 4)).head()
    }
    assert(bad.getMessage != null)
  }

  test("jacobi eigensolver recovers a hand-computed spectrum") {
    val (vals, vecs) = EmbedPca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector for lambda=3 is [1,1]/sqrt(2) up to sign
    val c3 = if (vals(0) > vals(1)) 0 else 1
    val v3 = Array(vecs(0)(c3), vecs(1)(c3))
    assert(math.abs(math.abs(v3(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v3(0) - v3(1)) < 1e-12, "lambda=3 vector is [1,1]-direction")
  }

  test("project() nulls scores for vectors shorter than the model dim (fit's skip rule)") {
    // fit() skips short vectors (they contribute no moments); project()
    // must mirror that — a common-prefix dot would silently score them
    // as zero-padded, indistinguishable from a real score downstream.
    val full = (1 to 20).map(i =>
      (i.toLong, Array(i.toFloat, (i % 5).toFloat, (i % 3).toFloat)))
    val short = Seq((100L, Array(1.0f, 2.0f)), (101L, Array[Float]()))
    val df = (full ++ short).toDF("id", "v")
    val model = EmbedPca.fit(df, "v", k = 2, dim = 3)
    val scored = EmbedPca.project(df, model, "v")
      .select($"id", $"pc1", $"pc2").collect()
    val byId = scored.map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(byId(100L) == ((true, true)) && byId(101L) == ((true, true)),
      "short vectors must get NULL scores")
    assert(full.forall { case (id, _) => byId(id) == ((false, false)) },
      "full-length vectors must all be scored")
  }

  test("low-rank data: PCA finds the plane, variance concentrates, reconstruction is exact") {
    val d = 8
    // two orthogonal directions with different scales, no noise
    val b1 = Array(1.0, 1.0, 0, 0, 0, 0, 0, 0).map(_ / math.sqrt(2))
    val b2 = Array(0, 0, 1.0, -1.0, 0, 0, 0, 0).map(_ / math.sqrt(2))
    val rows = (1 to 500).map { i =>
      val a = math.sin(i * 1.7) * 10   // big spread on b1
      val b = math.cos(i * 2.3) * 2    // small spread on b2
      (i.toLong, Array.tabulate(d)(j => (a * b1(j) + b * b2(j)).toFloat))
    }
    val df = rows.toDF("id", "v")
    val model = EmbedPca.fit(df, "v", k = 3, dim = d)
    val ve = model.varianceExplained
    assert(ve(1) > 0.999999, s"rank-2 data: 2 components explain all, got ${ve.toSeq}")
    assert(model.eigenvalues(2) < 1e-6 * model.eigenvalues(0))
    assert(model.eigenvalues(0) > model.eigenvalues(1))
    // the leading axis is the b1 direction (up to float rounding)
    val align = (0 until d).map(j => model.components(0)(j) * b1(j)).sum
    assert(math.abs(math.abs(align) - 1.0) < 1e-4, s"alignment $align")
    // projection reconstructs the centered vectors: per-row residual ~ 0
    val proj = EmbedPca.project(df, model, "v")
    val sample = proj.limit(50).collect()
    sample.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val scores = Array(r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val recon = Array.tabulate(d)(j => model.mean(j) +
        (0 until 3).map(c => scores(c) * model.components(c)(j)).sum)
      val err = math.sqrt((0 until d).map(j => math.pow(v(j) - recon(j), 2)).sum)
      assert(err < 1e-3, s"row ${r.getLong(0)}: reconstruction error $err")
    }
  }

  test("real embeddings: orthonormal components, descending eigenvalues, score variance matches, layout-stable") {
    val k = 4
    val model = EmbedPca.fit(embeddings, "embedding", k, dim = 64)
    // orthonormal
    for (i <- 0 until k; j <- i until k) {
      val dot = (0 until 64).map(r => model.components(i)(r) * model.components(j)(r)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<c$i,c$j> = $dot")
    }
    // spectrum sane
    for (i <- 0 until k - 1)
      assert(model.eigenvalues(i) >= model.eigenvalues(i + 1) - 1e-12)
    assert(model.eigenvalues(k - 1) >= -1e-9)
    assert(model.totalVar >= model.eigenvalues.sum - 1e-9)
    // population variance of each score column == its eigenvalue
    val proj = EmbedPca.project(embeddings, model, "embedding")
    val stats = proj.agg(
      count(lit(1)).cast("double"),
      sum($"pc1"), sum($"pc1" * $"pc1"),
      sum($"pc2"), sum($"pc2" * $"pc2")).head()
    val n = stats.getDouble(0)
    for ((sIdx, ev) <- Seq((1, model.eigenvalues(0)), (3, model.eigenvalues(1)))) {
      val s = stats.getDouble(sIdx); val ss = stats.getDouble(sIdx + 1)
      val popVar = ss / n - math.pow(s / n, 2)
      assert(math.abs(popVar - ev) < 1e-6 * math.max(1.0, ev),
        s"score variance $popVar vs eigenvalue $ev")
    }
    // refit under an adversarial partitioning: spectrum stable far
    // beyond the double-summation ulp drift
    val model17 = EmbedPca.fit(embeddings.repartition(17), "embedding", k, 64)
    for (i <- 0 until k)
      assert(math.abs(model17.eigenvalues(i) - model.eigenvalues(i)) < 1e-6)
    // whitening: every component's score variance becomes 1
    val white = EmbedPca.project(embeddings, model, "embedding", whiten = true)
    val ws = white.agg(
      count(lit(1)).cast("double"),
      sum($"pc1"), sum($"pc1" * $"pc1"),
      sum($"pc4"), sum($"pc4" * $"pc4")).head()
    val wn = ws.getDouble(0)
    for (idx <- Seq(1, 3)) {
      val s = ws.getDouble(idx); val ss = ws.getDouble(idx + 1)
      val v = ss / wn - math.pow(s / wn, 2)
      assert(math.abs(v - 1.0) < 1e-6, s"whitened variance $v")
    }
    // projection is a pure scan: no exchange anywhere in the plan
    val plan = white.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }
}

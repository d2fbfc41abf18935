package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Survival

/** Cox proportional hazards ([[Survival.coxPh]]): the score-test ==
  * log-rank identity at β = 0 on tie-free data, parity with an
  * independent row-level Newton reference, directional sanity on
  * planted hazard structure, the singular-matrix refusal, and
  * partitioning invariance.
  */
class CoxPhSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Tie-free two-group data: distinct times, mixed censoring. */
  private def tieFree = Seq(
    // (t, e, x) — x = group indicator
    (1L, 1, 1.0), (2L, 1, 0.0), (3L, 1, 1.0), (4L, 0, 1.0),
    (5L, 1, 0.0), (6L, 1, 1.0), (7L, 0, 0.0), (8L, 1, 0.0),
    (9L, 1, 1.0), (10L, 1, 0.0), (11L, 0, 1.0), (12L, 1, 0.0)
  ).toDF("t", "e", "x")

  test("score test at beta=0 equals the log-rank statistic on tie-free data") {
    // with a single binary covariate and d=1 at every event time, the
    // Cox score U(0) is exactly O_A − E_A and the information I(0)
    // exactly the hypergeometric variance — the log-rank z² is the
    // score test (Cox 1972 §5 / standard survival-text identity)
    val (u, i) = Survival.coxScoreAt(tieFree, "t", "e", Seq("x"),
      Array(0.0))
    val scoreZ = u(0) / math.sqrt(i(0)(0))
    val lr = Survival.logRank(
      tieFree.withColumn("g", when(col("x") === 1.0, "A").otherwise("B")),
      "g", "t", "e", groupA = "A").head()
    val lrZ = lr.getAs[Double]("z")
    // log-rank floors E and V at ppm per event time (9 event times →
    // ≤ 9e-6 absolute slack before the rounded-6 z)
    assert(math.abs(scoreZ - lrZ) < 1e-4, s"score $scoreZ vs logrank $lrZ")
  }

  /** Independent reference: Newton–Raphson on the Breslow partial
    * likelihood computed ROW-wise (no cell table, no suffix
    * accumulators — a separate arithmetic path).
    */
  private def referenceCox(rows: Seq[(Long, Int, Array[Double])],
                           p: Int, iters: Int): Array[Double] = {
    var beta = Array.fill(p)(0.0)
    for (_ <- 0 until iters) {
      val u = Array.fill(p)(0.0)
      val info = Array.fill(p, p)(0.0)
      val eventTimes = rows.filter(_._2 == 1).map(_._1).distinct.sorted
      for (t <- eventTimes) {
        val risk = rows.filter(_._1 >= t)
        val w = risk.map(r => math.exp(r._3.zip(beta)
          .map { case (x, b) => x * b }.sum))
        val s0 = w.sum
        val s1 = Array.tabulate(p)(k =>
          risk.zip(w).map { case (r, wi) => wi * r._3(k) }.sum)
        val events = rows.filter(r => r._1 == t && r._2 == 1)
        val d = events.length
        for (k <- 0 until p) {
          u(k) += events.map(_._3(k)).sum - d * s1(k) / s0
          for (l <- 0 until p) {
            val s2kl = risk.zip(w)
              .map { case (r, wi) => wi * r._3(k) * r._3(l) }.sum
            info(k)(l) += d * (s2kl / s0 - s1(k) * s1(l) / (s0 * s0))
          }
        }
      }
      // 1-2 covariate closed-form / Cramer solve
      if (p == 1) beta(0) += u(0) / info(0)(0)
      else {
        val det = info(0)(0) * info(1)(1) - info(0)(1) * info(1)(0)
        val d0 = (u(0) * info(1)(1) - u(1) * info(0)(1)) / det
        val d1 = (info(0)(0) * u(1) - info(1)(0) * u(0)) / det
        beta(0) += d0; beta(1) += d1
      }
    }
    beta
  }

  test("two-covariate fit matches the independent row-level reference") {
    val raw = (1 to 40).map { i =>
      val x1 = if (i % 3 == 0) 1.0 else 0.0
      val x2 = if (i % 5 < 2) 1.0 else 0.0
      // planted hazard: x1 shortens times, with jitter and censoring
      val t = (7 + (i * 13 % 17) - (if (x1 == 1.0) 4 else 0)).toLong
      val e = if (i % 7 == 0) 0 else 1
      (t, e, x1, x2)
    }
    val df = raw.toDF("t", "e", "x1", "x2")
    val got = Survival.coxPh(df, "t", "e", Seq("x1", "x2"), iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = referenceCox(
      raw.map(r => (r._1, r._2, Array(r._3, r._4))), 2, 8)
    assert(math.abs(got("x1") - ref(0)) < 1e-7,
      s"x1 ${got("x1")} vs ${ref(0)}")
    assert(math.abs(got("x2") - ref(1)) < 1e-7,
      s"x2 ${got("x2")} vs ${ref(1)}")
    // planted direction: x1 = 1 hazards are higher (shorter times)
    assert(got("x1") > 0.5)
  }

  test("output carries hr = exp(beta) and z = beta/se, rounded") {
    val r = Survival.coxPh(tieFree, "t", "e", Seq("x"), iters = 4)
      .head()
    val beta = r.getAs[Double]("beta")
    assert(math.abs(r.getAs[Double]("hr") - math.exp(beta)) < 1e-6)
    assert(math.abs(r.getAs[Double]("z")
      - beta / r.getAs[Double]("se")) < 1e-3)
  }

  test("constant covariate refuses (singular information)") {
    val df = Seq((1L, 1, 1.0), (2L, 1, 1.0), (3L, 0, 1.0))
      .toDF("t", "e", "x")
    val e = intercept[IllegalArgumentException] {
      Survival.coxPh(df, "t", "e", Seq("x"))
    }
    assert(e.getMessage.contains("singular"))
  }

  test("cell-cap refusal and covariate-count bounds") {
    val df = tieFree
    val e = intercept[IllegalArgumentException] {
      Survival.coxPh(df, "t", "e", Seq("x"), maxCells = 2L)
    }
    assert(e.getMessage.contains("maxCells"))
    intercept[IllegalArgumentException] {
      Survival.coxPh(df, "t", "e", Seq.empty)
    }
  }

  test("partitioning invariance: identical bits at any layout") {
    val raw = (1 to 60).map { i =>
      ((i * 11 % 23 + 1).toLong, if (i % 6 == 0) 0 else 1,
        if (i % 2 == 0) 1.0 else 0.0, if (i % 3 == 0) 1.0 else 0.0)
    }
    def run(parts: Int): Seq[(String, Double, Double)] =
      Survival.coxPh(raw.toDF("t", "e", "x1", "x2").repartition(parts),
          "t", "e", Seq("x1", "x2"))
        .collect().map(r => (r.getString(0), r.getDouble(1),
          r.getDouble(3))).toSeq
    assert(run(1) == run(13))
  }
}

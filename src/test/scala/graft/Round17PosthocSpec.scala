package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{GroupTests, Logit, StatTests}
import graft.streaming.StreamAnova2

/** Round-17 wave 2: post-hoc pairwise Welch under BH-FDR,
  * Cochran–Armitage trend, grouped logistic regression (closed-form
  * identities), and the streaming two-way-ANOVA twin.
  */
class Round17PosthocSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- post-hoc pairwise Welch + BH ----

  test("posthoc: all pairs tested, BH envelope monotone, ranks " +
      "ascending in p") {
    val rows = (for (i <- 1 to 30) yield ("f", "A", i.toLong)) ++
      (for (i <- 1 to 30) yield ("f", "B", (i + 40).toLong)) ++
      (for (i <- 1 to 30) yield ("f", "C", (i * 3).toLong))
    val out = StatTests.posthocPairwiseWelch(
      rows.toDF("g", "s", "v"), "g", "s", "v").collect()
    assert(out.length == 3) // AB, AC, BC
    val byI = out.sortBy(_.getAs[Long]("i"))
    // p ascending with i; p_adj is the monotone suffix envelope
    assert(byI.map(_.getAs[Double]("p")).toSeq ==
      byI.map(_.getAs[Double]("p")).sortBy(identity).toSeq)
    val padj = byI.map(_.getAs[Double]("p_adj")).toSeq
    assert(padj == padj.sortBy(identity), padj.toString)
    assert(out.forall(r => r.getAs[Long]("m") == 3L))
    assert(out.forall(r =>
      r.getAs[Boolean]("reject") == (r.getAs[Double]("p_adj") <= 0.05)))
    // the far-separated A-vs-B contrast must be the strongest
    assert(byI.head.getAs[String]("contrast") == "f|A|B")
  }

  test("posthoc t matches the q108 Welch formula on exact moments") {
    val a = Seq(1L, 2L, 3L, 4L)
    val b = Seq(10L, 12L, 14L, 16L)
    val rows = a.map(("f", "A", _)) ++ b.map(("f", "B", _))
    val r = StatTests.posthocPairwiseWelch(
      rows.toDF("g", "s", "v"), "g", "s", "v").collect().head
    def vn(xs: Seq[Long]): Double = {
      val n = xs.size
      val s = xs.sum.toDouble
      val q = xs.map(x => x.toDouble * x).sum
      ((n * q - s * s) / (n.toDouble * (n - 1))) / n
    }
    val t = (a.sum.toDouble / a.size - b.sum.toDouble / b.size) /
      math.sqrt(vn(a) + vn(b))
    val want = BigDecimal(t).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("t") == want, r.toString)
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
  }

  test("posthoc: singleton samples and zero-variance pairs are " +
      "excluded from the BH family; magnitude gate is " +
      "projection-proof") {
    val rows = Seq(("f", "A", 1L), ("f", "A", 2L), ("f", "B", 5L),
      ("f", "B", 6L), ("f", "C", 9L), // C is a singleton
      ("f", "D", 4L), ("f", "D", 4L)) // D has zero variance
    val out = StatTests.posthocPairwiseWelch(
      rows.toDF("g", "s", "v"), "g", "s", "v").collect()
    // pairs among {A, B, D} minus the zero-variance A-D... A-D has
    // vnA > 0 so it stays; only D-D... enumerate: AB, AD, BD — D's
    // variance is 0 but the POOLED vn sum is positive when the other
    // side varies, so all three test; C never pairs (n=1)
    assert(out.length == 3, out.mkString(";"))
    assert(!out.exists(r => r.getAs[String]("s_a") == "C" ||
      r.getAs[String]("s_b") == "C"))
    val big = Seq(("f", "A", 4000000000000000000L), ("f", "A", 1L),
      ("f", "B", 2L), ("f", "B", 3L)).toDF("g", "s", "v")
    val e = SparkTestSession.refusalMessage {
      StatTests.posthocPairwiseWelch(big, "g", "s", "v")
        .select("contrast", "n_a", "n_b").collect()
    }
    assert(e.contains("rescale"), e)
  }

  // ---- Cochran–Armitage ----

  test("CA hand case: doses (0,1,2) with (10,2)(10,5)(10,8) gives " +
      "z = 2.683282; score reversal flips the sign") {
    def mk(rev: Boolean) = (for {
      (w, y) <- Seq((0L, 2), (1L, 5), (2L, 8))
      i <- 1 to 10
    } yield ("f", if (rev) 2L - w else w, i <= y)).toDF("g", "w", "y")
    val r = StatTests.cochranArmitage(mk(false), "g", "w", "y")
      .collect().head
    assert(r.getAs[Long]("n") == 30L && r.getAs[Long]("y") == 15L)
    assert(r.getAs[Long]("t") == 21L && r.getAs[Long]("wn") == 30L &&
      r.getAs[Long]("wwn") == 50L)
    assert(r.getAs[Double]("z") == 2.683282, r.toString)
    val rr = StatTests.cochranArmitage(mk(true), "g", "w", "y")
      .collect().head
    assert(rr.getAs[Double]("z") == -2.683282, rr.toString)
  }

  test("CA null conventions and projection-proof gate") {
    // all-success: no variance in outcome → z null
    val allY = Seq(("f", 0L, true), ("f", 1L, true)).toDF("g", "w", "y")
    val r = StatTests.cochranArmitage(allY, "g", "w", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("z")))
    // single dose: variance term 0 → z null
    val oneW = Seq(("f", 3L, true), ("f", 3L, false)).toDF("g", "w", "y")
    val r2 = StatTests.cochranArmitage(oneW, "g", "w", "y").collect().head
    assert(r2.isNullAt(r2.fieldIndex("z")))
    val big = Seq(("f", 4000000000000000000L, true), ("f", 1L, false))
      .toDF("g", "w", "y")
    val e = SparkTestSession.refusalMessage {
      StatTests.cochranArmitage(big, "g", "w", "y")
        .select("g", "n").collect()
    }
    assert(e.contains("BIGINT"), e)
  }

  // ---- grouped logistic regression ----

  test("logit 2x2 closed form: beta1 = log OR, se1 = Woolf, " +
      "intercept = reference log-odds") {
    val rows = Seq.fill(10)(("g", 0L, true)) ++
      Seq.fill(30)(("g", 0L, false)) ++
      Seq.fill(30)(("g", 1L, true)) ++
      Seq.fill(10)(("g", 1L, false))
    val out = Logit.fitGrouped(rows.toDF("g", "x", "y"), "g",
      Seq("x"), "y").collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    val b0 = out("intercept").getAs[Double]("beta")
    val b1 = out("x").getAs[Double]("beta")
    val se1 = out("x").getAs[Double]("se")
    assert(math.abs(b0 - math.log(10.0 / 30.0)) < 1e-8, b0.toString)
    assert(math.abs(b1 - math.log(9.0)) < 1e-8, b1.toString)
    assert(math.abs(se1 - math.sqrt(1.0 / 10 + 1.0 / 30 + 1.0 / 30 +
      1.0 / 10)) < 1e-8, se1.toString)
  }

  test("logit: symmetric data gives beta = 0 exactly; group " +
      "isolation; partitioning invariance") {
    val sym = Seq.fill(20)(("g", 0L, true)) ++
      Seq.fill(20)(("g", 0L, false)) ++
      Seq.fill(20)(("g", 1L, true)) ++
      Seq.fill(20)(("g", 1L, false))
    val out = Logit.fitGrouped(sym.toDF("g", "x", "y"), "g",
      Seq("x"), "y").collect()
    assert(out.forall(_.getAs[Double]("beta") == 0.0))
    // isolation: a second, different group leaves the first intact
    val two = sym ++ (Seq.fill(5)(("h", 0L, true)) ++
      Seq.fill(15)(("h", 0L, false)) ++
      Seq.fill(15)(("h", 1L, true)) ++
      Seq.fill(5)(("h", 1L, false)))
    def run(parts: Int): Map[(String, String), Double] =
      Logit.fitGrouped(two.toDF("g", "x", "y").repartition(parts), "g",
        Seq("x"), "y").collect()
        .map(r => (r.getAs[String]("g"), r.getAs[String]("term")) ->
          r.getAs[Double]("beta")).toMap
    val a = run(1)
    assert(a(("g", "x")) == 0.0)
    assert(math.abs(a(("h", "x")) - math.log(9.0)) < 1e-8)
    assert(a == run(7))
  }

  test("logit refusals: separation, collinear covariates, maxCells") {
    val sep = Seq.fill(20)(("g", 0L, false)) ++
      Seq.fill(20)(("g", 1L, true))
    assert(SparkTestSession.refusalMessage {
      Logit.fitGrouped(sep.toDF("g", "x", "y"), "g", Seq("x"), "y")
        .collect()
    }.contains("SEPARATION"))
    val const = Seq(("g", 1L, 1L, true), ("g", 1L, 1L, false),
      ("g", 1L, 0L, true))
    assert(SparkTestSession.refusalMessage {
      Logit.fitGrouped(const.toDF("g", "x1", "x2", "y"), "g",
        Seq("x1", "x2"), "y").collect()
    }.contains("singular"))
    val many = (1 to 50).map(i => ("g", i.toLong, i % 2 == 0))
    assert(SparkTestSession.refusalMessage {
      Logit.fitGrouped(many.toDF("g", "x", "y"), "g", Seq("x"), "y",
        maxCells = 10L).collect()
    }.contains("maxCells"))
  }

  // ---- grouped Poisson regression ----

  test("poisson single binary covariate: beta1 = log rate ratio " +
      "exactly, se = sqrt(1/S1 + 1/S0), intercept = log reference " +
      "rate") {
    // x=0: 20 rows totalling 40 events (rate 2); x=1: 10 rows
    // totalling 60 events (rate 6) → beta1 = log 3
    val rows = (1 to 20).map(i => ("g", 0L, 2L)) ++
      (1 to 10).map(i => ("g", 1L, 6L))
    val out = graft.operators.PoissonReg.fitGrouped(
      rows.toDF("g", "x", "y"), "g", Seq("x"), "y").collect()
      .map(r => r.getAs[String]("term") -> r).toMap
    assert(math.abs(out("intercept").getAs[Double]("beta")
      - math.log(2.0)) < 1e-8)
    assert(math.abs(out("x").getAs[Double]("beta")
      - math.log(3.0)) < 1e-8)
    assert(math.abs(out("x").getAs[Double]("se")
      - math.sqrt(1.0 / 60 + 1.0 / 40)) < 1e-8)
    assert(math.abs(out("intercept").getAs[Double]("se")
      - math.sqrt(1.0 / 40)) < 1e-8)
  }

  test("poisson: equal rates give beta1 = 0; group isolation and " +
      "partitioning invariance") {
    val rows = (1 to 15).map(_ => ("g", 0L, 3L)) ++
      (1 to 25).map(_ => ("g", 1L, 3L)) ++
      (1 to 10).map(_ => ("h", 0L, 1L)) ++
      (1 to 10).map(_ => ("h", 1L, 4L))
    def run(parts: Int): Map[(String, String), Double] =
      graft.operators.PoissonReg.fitGrouped(
        rows.toDF("g", "x", "y").repartition(parts), "g", Seq("x"), "y")
        .collect()
        .map(r => (r.getAs[String]("g"), r.getAs[String]("term")) ->
          r.getAs[Double]("beta")).toMap
    val a = run(1)
    assert(math.abs(a(("g", "x"))) < 1e-9, a.toString)
    assert(math.abs(a(("h", "x")) - math.log(4.0)) < 1e-8)
    assert(a == run(5))
  }

  test("poisson refusals: zero-count group, half-space divergence, " +
      "negative counts, maxCells") {
    val zero = Seq(("g", 0L, 0L), ("g", 1L, 0L)).toDF("g", "x", "y")
    assert(SparkTestSession.refusalMessage {
      graft.operators.PoissonReg.fitGrouped(zero, "g", Seq("x"), "y")
        .collect()
    }.contains("zero total count"))
    // all events at x=0, none at x=1 → beta1 walks to -inf
    val half = ((1 to 10).map(_ => ("g", 0L, 5L)) ++
      (1 to 10).map(_ => ("g", 1L, 0L))).toDF("g", "x", "y")
    val e = SparkTestSession.refusalMessage {
      graft.operators.PoissonReg.fitGrouped(half, "g", Seq("x"), "y")
        .collect()
    }
    assert(e.contains("DIVERGED") || e.contains("did not converge"), e)
    val neg = Seq(("g", 0L, 1L), ("g", 1L, -2L)).toDF("g", "x", "y")
    assert(SparkTestSession.refusalMessage {
      graft.operators.PoissonReg.fitGrouped(neg, "g", Seq("x"), "y")
        .collect()
    }.contains("non-negative"))
    val many = (1 to 50).map(i => ("g", i.toLong, 1L))
    assert(SparkTestSession.refusalMessage {
      graft.operators.PoissonReg.fitGrouped(many.toDF("g", "x", "y"),
        "g", Seq("x"), "y", maxCells = 10L).collect()
    }.contains("maxCells"))
  }

  // ---- streaming two-way ANOVA twin ----

  test("StreamAnova2: 3 streamed batches == batch anovaTwoWay; " +
      "replay is a no-op") {
    val rows = for {
      gi <- Seq("f", "h"); a <- Seq("a1", "a2"); b <- Seq("b1", "b2")
      k <- 1 to 6
    } yield (gi, a, b, (a.hashCode % 13 + b.hashCode % 7 + k * 3
      + gi.length).toLong)
    val dir = Files.createTempDirectory("sa2").toString
    rows.grouped(17).zipWithIndex.foreach { case (batch, i) =>
      StreamAnova2.applyBatch(batch.toDF("g", "fa", "fb", "v"),
        "g", "fa", "fb", "v", dir, i.toLong)
    }
    def norm(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    val want = norm(GroupTests.anovaTwoWay(
      rows.toDF("g", "fa", "fb", "v"), "g", "fa", "fb", "v"))
    assert(norm(StreamAnova2.anova2(spark, dir, "g")) == want)
    StreamAnova2.applyBatch(rows.take(17).toDF("g", "fa", "fb", "v"),
      "g", "fa", "fb", "v", dir, 0L)
    assert(norm(StreamAnova2.anova2(spark, dir, "g")) == want)
  }
}

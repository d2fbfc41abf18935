package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ols

/** Grouped multivariate OLS: exact-fit hand values on both paths
  * (the Cramer-exact [[Ols.fitGrouped2]] and the Gram-moment
  * [[Ols.fitFromGram]]), cross-path agreement, the q84
  * single-covariate cross-check, singularity and magnitude refusals,
  * partitioning invariance.
  */
class OlsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // y = 3 + 2·x1 − x2 exactly: recoverable coefficients, R² = 1
  private val exact = Seq((0L, 0L), (1L, 0L), (0L, 1L), (2L, 1L),
    (1L, 2L), (3L, 2L)).map { case (x1, x2) =>
    ("g1", x1, x2, 3L + 2L * x1 - x2)
  }

  test("fitGrouped2 recovers an exact linear law: b=(3,2,-1), r2=1") {
    val r = Ols.fitGrouped2(exact.toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y").collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("b0") == 3.0 && r.getAs[Double]("b1") == 2.0 &&
      r.getAs[Double]("b2") == -1.0, r.toString)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("fitFromGram agrees with fitGrouped2 on the exact law") {
    val r = Ols.fitFromGram(exact.toDF("g", "x1", "x2", "y"),
      "g", Seq("x1", "x2"), "y").collect().head
    val coefs = r.getSeq[Double](r.fieldIndex("coefs"))
    assert(coefs == Seq(3.0, 2.0, -1.0), coefs.toString)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("noisy two-group fit: paths agree to 1e-6 and groups are isolated") {
    val rows = (1 to 200).map { i =>
      val g = "g" + (i % 2)
      val x1 = (i * 7 % 23).toLong; val x2 = (i * 13 % 11).toLong
      val noise = (i * 31 % 5).toLong - 2L
      (g, x1, x2, 10L + 3L * x1 + (if (g == "g0") -2L else 4L) * x2 + noise)
    }
    val df = rows.toDF("g", "x1", "x2", "y")
    val a = Ols.fitGrouped2(df, "g", "x1", "x2", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val b = Ols.fitFromGram(df, "g", Seq("x1", "x2"), "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(a.keySet == Set("g0", "g1") && b.keySet == a.keySet)
    for (g <- a.keySet) {
      val coefs = b(g).getSeq[Double](b(g).fieldIndex("coefs"))
      assert(math.abs(a(g).getAs[Double]("b0") - coefs(0)) < 1e-6)
      assert(math.abs(a(g).getAs[Double]("b1") - coefs(1)) < 1e-6)
      assert(math.abs(a(g).getAs[Double]("b2") - coefs(2)) < 1e-6)
      assert(math.abs(a(g).getAs[Double]("r2") -
        b(g).getAs[Double]("r2")) < 1e-6)
      // x2's sign flips between the groups — isolation is visible
    }
    assert(a("g0").getAs[Double]("b2") < 0 && a("g1").getAs[Double]("b2") > 0)
  }

  test("single-covariate fitFromGram == q84's exact slope/intercept") {
    val sfDir = "/root/testdata/sf0.001"
    val want = graft.queries.Advanced.q84GroupTrend(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"))).toMap
    val docs = graft.sources.TableCatalog.documents(spark, sfDir)
    val got = Ols.fitFromGram(docs, "source", Seq("doc_id"), "n_chars")
      .collect().map { r =>
        val c = r.getSeq[Double](r.fieldIndex("coefs"))
        r.getString(0) -> (c(1), c(0))
      }.toMap
    assert(got.keySet == want.keySet && want.nonEmpty)
    for (g <- want.keySet) {
      assert(math.abs(got(g)._1 - want(g)._1) < 1e-6,
        s"$g slope ${got(g)._1} vs ${want(g)._1}")
      assert(math.abs(got(g)._2 - want(g)._2) < 1e-4,
        s"$g intercept ${got(g)._2} vs ${want(g)._2}")
    }
  }

  test("collinear covariates: fitGrouped2 nulls, fitFromGram refuses loudly") {
    val col2 = exact.map { case (g, x1, _, y) => (g, x1, 2L * x1, y) }
    val r = Ols.fitGrouped2(col2.toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("b0")) && r.isNullAt(r.fieldIndex("r2")))
    val e = intercept[IllegalArgumentException] {
      Ols.fitFromGram(col2.toDF("g", "x1", "x2", "y"),
        "g", Seq("x1", "x2"), "y").collect()
    }
    assert(e.getMessage.contains("singular"), e.getMessage)
  }

  test("fitGrouped2 magnitude refusal fires BEFORE the decimal algebra") {
    val big = (1 to 100).map(i =>
      ("g", i.toLong, (i % 7).toLong, 1000000000000000000L))
    val e = SparkTestSession.refusalMessage {
      Ols.fitGrouped2(big.toDF("g", "x1", "x2", "y"),
        "g", "x1", "x2", "y").collect()
    }
    assert(e.contains("fitFromGram"), e)
  }

  test("fitFromGram refusals: too many groups, underdetermined group") {
    val many = (1 to 10).map(i => (s"g$i", 1L, 2L, 3L))
    val e1 = intercept[IllegalArgumentException] {
      Ols.fitFromGram(many.toDF("g", "x1", "x2", "y"), "g",
        Seq("x1", "x2"), "y", maxGroups = 3L).collect()
    }
    assert(e1.getMessage.contains("maxGroups"), e1.getMessage)
    val tiny = Seq(("g", 1L, 2L, 3L), ("g", 2L, 1L, 4L))
    val e2 = intercept[IllegalArgumentException] {
      Ols.fitFromGram(tiny.toDF("g", "x1", "x2", "y"), "g",
        Seq("x1", "x2"), "y").collect()
    }
    assert(e2.getMessage.contains("underdetermined"), e2.getMessage)
  }

  test("inference columns: se/t match a naive dense recomputation; " +
      "a perfect fit gives se = 0 and t = null") {
    // perfect fit: SSE = 0 exactly → se 0.0 (greatest absorbs −ulp),
    // t undefined
    val r0 = Ols.fitGrouped2(exact.toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y").collect().head
    assert(r0.getAs[Double]("se0") == 0.0 &&
      r0.getAs[Double]("se1") == 0.0 && r0.getAs[Double]("se2") == 0.0,
      r0.toString)
    assert(r0.isNullAt(r0.fieldIndex("t0")) &&
      r0.isNullAt(r0.fieldIndex("t1")), r0.toString)
    // noisy group: independent naive dense algebra on the driver
    val rows = (1 to 50).map { i =>
      val x1 = (i * 7 % 23).toLong; val x2 = (i * 13 % 11).toLong
      ("g", x1, x2, 10L + 3L * x1 - 2L * x2 + (i * 31 % 5).toLong - 2L)
    }
    val r = Ols.fitGrouped2(rows.toDF("g", "x1", "x2", "y"),
      "g", "x1", "x2", "y").collect().head
    // naive: X'X, X'y in doubles; adjugate 3×3 inverse; residual SSE
    val n = rows.size.toDouble
    val xs = rows.map { case (_, x1, x2, _) =>
      Array(1.0, x1.toDouble, x2.toDouble) }
    val ys = rows.map(_._4.toDouble)
    val xtx = Array.tabulate(3, 3)((i, j) =>
      xs.map(x => x(i) * x(j)).sum)
    val xty = Array.tabulate(3)(i =>
      xs.zip(ys).map { case (x, y) => x(i) * y }.sum)
    def det3(m: Array[Array[Double]]): Double =
      m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    val dt = det3(xtx)
    def cof(i: Int, j: Int): Double = {
      val sub = (0 until 3).filter(_ != i).map(r2 =>
        (0 until 3).filter(_ != j).map(c2 => xtx(r2)(c2)).toArray).toArray
      val s = sub(0)(0) * sub(1)(1) - sub(0)(1) * sub(1)(0)
      (if ((i + j) % 2 == 0) 1.0 else -1.0) * s
    }
    val inv = Array.tabulate(3, 3)((i, j) => cof(j, i) / dt)
    val beta = Array.tabulate(3)(i =>
      (0 until 3).map(j => inv(i)(j) * xty(j)).sum)
    val sse = xs.zip(ys).map { case (x, y) =>
      val f = (0 until 3).map(i => beta(i) * x(i)).sum
      (y - f) * (y - f) }.sum
    val sigma2 = sse / (n - 3.0)
    for ((seCol, tCol, i) <- Seq(("se0", "t0", 0), ("se1", "t1", 1),
        ("se2", "t2", 2))) {
      val seN = math.sqrt(sigma2 * inv(i)(i))
      assert(math.abs(r.getAs[Double](seCol) - seN) < 1e-5,
        s"$seCol: ${r.getAs[Double](seCol)} vs naive $seN")
      assert(math.abs(r.getAs[Double](tCol) - beta(i) / seN) < 1e-4,
        s"$tCol: ${r.getAs[Double](tCol)} vs naive ${beta(i) / seN}")
    }
  }

  test("fitGrouped2 partitioning invariance (exact integers end-to-end)") {
    val rows = (1 to 300).map { i =>
      ("g" + (i % 3), (i * 7 % 41).toLong, (i * 11 % 13).toLong,
        (i * 31 % 97).toLong)
    }
    def run(parts: Int): Seq[String] =
      Ols.fitGrouped2(rows.toDF("g", "x1", "x2", "y").repartition(parts),
        "g", "x1", "x2", "y").collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(17))
  }
}

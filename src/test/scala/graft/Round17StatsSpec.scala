package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{GroupTests, Ols}

/** Round-17 additions: two-way ANOVA with interaction (the apex of
  * the K-sample battery) and exact-path ridge regression (penalized
  * Cramer algebra over the q169 moments).
  */
class Round17StatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- two-way ANOVA ----

  test("anova2 balanced hand case: ssa=200 ssb=32 ssab=0 ssw=8; " +
      "f_a=100 f_b=16 f_ab=0") {
    val rows = Seq(
      ("f", "a1", "b1", 10L), ("f", "a1", "b1", 12L),
      ("f", "a1", "b2", 14L), ("f", "a1", "b2", 16L),
      ("f", "a2", "b1", 20L), ("f", "a2", "b1", 22L),
      ("f", "a2", "b2", 24L), ("f", "a2", "b2", 26L))
      .toDF("g", "fa", "fb", "v")
    val r = GroupTests.anovaTwoWay(rows, "g", "fa", "fb", "v")
      .collect().head
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("n_cells") == 4L)
    assert(r.getAs[Long]("a_lvls") == 2L && r.getAs[Long]("b_lvls") == 2L)
    assert(r.getAs[Long]("ssa") == 200L, r.toString)
    assert(r.getAs[Long]("ssb") == 32L, r.toString)
    assert(r.getAs[Long]("ssab") == 0L, r.toString)
    assert(r.getAs[Long]("ssw") == 8L, r.toString)
    assert(r.getAs[Double]("f_a") == 100.0, r.toString)
    assert(r.getAs[Double]("f_b") == 16.0, r.toString)
    assert(r.getAs[Double]("f_ab") == 0.0, r.toString)
  }

  test("anova2 interaction hand case: crossed means with a pure " +
      "interaction effect put all between-SS into ssab") {
    // cell means: (a1,b1)=0, (a1,b2)=10, (a2,b1)=10, (a2,b2)=0 — both
    // marginals are flat (5 everywhere), so ssa = ssb = 0 exactly
    val rows = Seq(
      ("f", "a1", "b1", -1L), ("f", "a1", "b1", 1L),
      ("f", "a1", "b2", 9L), ("f", "a1", "b2", 11L),
      ("f", "a2", "b1", 9L), ("f", "a2", "b1", 11L),
      ("f", "a2", "b2", -1L), ("f", "a2", "b2", 1L))
      .toDF("g", "fa", "fb", "v")
    val r = GroupTests.anovaTwoWay(rows, "g", "fa", "fb", "v")
      .collect().head
    assert(r.getAs[Long]("ssa") == 0L && r.getAs[Long]("ssb") == 0L,
      r.toString)
    assert(r.getAs[Long]("ssab") == 200L, r.toString)
    assert(r.getAs[Long]("ssw") == 8L, r.toString)
    assert(r.getAs[Double]("f_ab") == 100.0, r.toString)
  }

  /** brute-force floored decomposition with BigInt (truncating
    * division on non-negative squares == Spark DIV == DuckDB //)
    */
  private def brute(rows: Seq[(String, String, String, Long)])
      : Map[String, (BigInt, BigInt, BigInt, BigInt)] =
    rows.groupBy(_._1).map { case (g, rs) =>
      def term(groups: Iterable[Seq[Long]]): BigInt =
        groups.map { vs =>
          val s = vs.map(BigInt(_)).sum
          (s * s) / BigInt(vs.size)
        }.sum
      val tca = term(rs.groupBy(r => (r._2, r._3)).values.map(_.map(_._4)))
      val taa = term(rs.groupBy(_._2).values.map(_.map(_._4)))
      val tba = term(rs.groupBy(_._3).values.map(_.map(_._4)))
      val s = rs.map(r => BigInt(r._4)).sum
      val q = rs.map(r => BigInt(r._4) * BigInt(r._4)).sum
      val t0 = (s * s) / BigInt(rs.size)
      g -> (taa - t0, tba - t0, tca - taa - tba + t0, q - tca)
    }

  test("anova2 unbalanced brute-force parity (uneven cells, negative " +
      "values, several families) across partitionings") {
    val rows = for {
      gi <- 1 to 3
      a <- Seq("p", "q", "r")
      b <- Seq("u", "v")
      k <- 1 to (gi + a.length + b.length) % 4 + 1
    } yield (s"g$gi", a, b, ((gi * 31 + a.hashCode % 17 + b.hashCode % 7
      + k * 13) % 41 - 15).toLong)
    val want = brute(rows)
    for (parts <- Seq(1, 7)) {
      val got = GroupTests.anovaTwoWay(
          rows.toDF("g", "fa", "fb", "v").repartition(parts),
          "g", "fa", "fb", "v")
        .collect()
        .map(r => r.getString(0) ->
          (BigInt(r.getAs[Long]("ssa")), BigInt(r.getAs[Long]("ssb")),
            BigInt(r.getAs[Long]("ssab")), BigInt(r.getAs[Long]("ssw"))))
        .toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("anova2 null conventions: single level, no error dof, " +
      "incomplete crossing") {
    // one B level only: f_b null; complete 2x1 crossing: dfab = 0 so
    // f_ab null; n == n_cells (one obs per cell): no error dof at all
    val oneObs = Seq(("f", "a1", "b1", 1L), ("f", "a2", "b1", 5L))
      .toDF("g", "fa", "fb", "v")
    val r = GroupTests.anovaTwoWay(oneObs, "g", "fa", "fb", "v")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("f_a")))
    assert(r.isNullAt(r.fieldIndex("f_b")))
    assert(r.isNullAt(r.fieldIndex("f_ab")))
  }

  test("anova2 magnitude gate refuses under an (g, n)-only " +
      "projection (pruning-proof from day one)") {
    val rows = Seq(("f", "a", "b", 4000000000000000000L),
      ("f", "a", "c", 1L), ("f", "b", "b", 2L)).toDF("g", "fa", "fb", "v")
    val e = SparkTestSession.refusalMessage {
      GroupTests.anovaTwoWay(rows, "g", "fa", "fb", "v")
        .select("g", "n").collect()
    }
    assert(e.contains("rescale"), e)
  }

  // ---- ridge on the exact path ----

  test("ridge λ=0 equals OLS bit-for-bit (cross-operator identity)") {
    val rows = (1 to 40).map(i =>
      ("g" + (i % 3), (i % 7).toLong, (i % 5).toLong, (i * 3 % 11).toLong))
    val df = rows.toDF("g", "x1", "x2", "y")
    val ols = Ols.fitGrouped2(df, "g", "x1", "x2", "y")
      .select("g", "n", "b0", "b1", "b2").collect()
      .map(_.toString).sorted.toSeq
    val rid = Ols.ridgeGrouped2(df, "g", "x1", "x2", "y", Seq(0L))
      .select("g", "n", "b0", "b1", "b2").collect()
      .map(_.toString).sorted.toSeq
    assert(ols == rid)
  }

  test("ridge hand case: a constant covariate is singular at λ=0 but " +
      "regularized at λ=1 to the simple-regression shrinkage") {
    // (x1, y) = (1,3),(2,5),(3,7), x2 ≡ 0: at λ=1 the penalized system
    // gives b1 = 12/9, b0 = 21/9, b2 = 0 by hand Cramer
    val df = Seq(("g", 1L, 0L, 3L), ("g", 2L, 0L, 5L), ("g", 3L, 0L, 7L))
      .toDF("g", "x1", "x2", "y")
    val out = Ols.ridgeGrouped2(df, "g", "x1", "x2", "y", Seq(0L, 1L))
      .collect().map(r => r.getAs[Long]("lambda") -> r).toMap
    assert(out(0L).isNullAt(out(0L).fieldIndex("b1")))
    assert(out(1L).getAs[Double]("b0") == 2.333333, out(1L).toString)
    assert(out(1L).getAs[Double]("b1") == 1.333333, out(1L).toString)
    assert(out(1L).getAs[Double]("b2") == 0.0, out(1L).toString)
  }

  test("ridge shrinks covariate coefficients monotonically toward " +
      "zero as λ grows") {
    val df = (1 to 20).map(i => ("g", i.toLong, (i % 3).toLong, 2L * i))
      .toDF("g", "x1", "x2", "y")
    val b1 = Ols.ridgeGrouped2(df, "g", "x1", "x2", "y",
        Seq(0L, 1000L, 1000000L)).collect()
      .map(r => r.getAs[Long]("lambda") -> r.getAs[Double]("b1")).toMap
    assert(b1(0L) == 2.0, b1.toString)
    assert(math.abs(b1(1000L)) < 2.0 && math.abs(b1(1000L)) > 0.0)
    assert(math.abs(b1(1000000L)) < math.abs(b1(1000L)))
  }

  test("fitFromGram(lambda) matches the exact ridge path within 1e-6") {
    val rows = (1 to 50).map(i =>
      ("g", (i % 9).toLong, (i % 4).toLong, (i * 7 % 13).toLong))
    val df = rows.toDF("g", "x1", "x2", "y")
    val exact = Ols.ridgeGrouped2(df, "g", "x1", "x2", "y", Seq(100L))
      .collect().head
    val gram = Ols.fitFromGram(df, "g", Seq("x1", "x2"), "y",
      lambda = 100.0).collect().head
    val coefs = gram.getSeq[Double](gram.fieldIndex("coefs"))
    assert(math.abs(coefs(0) - exact.getAs[Double]("b0")) < 1e-6)
    assert(math.abs(coefs(1) - exact.getAs[Double]("b1")) < 1e-6)
    assert(math.abs(coefs(2) - exact.getAs[Double]("b2")) < 1e-6)
  }

  test("ridge magnitude gate refuses when λ inflates the bound, and " +
      "under a coefficient-free projection") {
    val df = Seq(("g", 3000000000L, 1L, 5L), ("g", 2999999999L, 2L, 6L),
      ("g", 1L, 3L, 7L), ("g", 2L, 4L, 8L)).toDF("g", "x1", "x2", "y")
    // n·mx² ≈ 3.6e19 → 6·bx³ ≈ 2.8e59 — far over 9e37 even at λ=0
    val e = SparkTestSession.refusalMessage {
      Ols.ridgeGrouped2(df, "g", "x1", "x2", "y", Seq(0L))
        .select("g", "n").collect()
    }
    assert(e.contains("DECIMAL(38,0)"), e)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GroupTests, RankCorr, RobustStats}

/** Round-15 statistics additions: McNemar, Cochran's Q, Goodman–
  * Kruskal gamma / Somers' D, Page's trend test, Theil–Sen robust
  * slope, Brown–Forsythe — hand values, degeneracies, refusals,
  * cross-operator identities, invariance.
  */
class Round15StatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- McNemar ----

  test("McNemar hand case: b=3, c=1 gives chi2 = (3-1)²/4 = 1") {
    val rows = Seq.fill(3)(("f", true, false)) ++
      Seq(("f", false, true)) ++ Seq.fill(5)(("f", true, true)) ++
      Seq.fill(2)(("f", false, false))
    val r = GroupTests.mcnemar(rows.toDF("g", "a", "b"), "g", "a", "b")
      .collect().head
    assert(r.getAs[Long]("n_pairs") == 11L)
    assert(r.getAs[Long]("b") == 3L && r.getAs[Long]("c") == 1L)
    assert(r.getAs[Long]("chi2_ppm") == 1000000L)
    assert(r.getAs[Double]("chi2") == 1.0)
  }

  test("McNemar: no discordant pairs gives null; families isolated") {
    val rows = Seq(("z", true, true), ("z", false, false),
      ("f", true, false), ("f", false, true), ("f", false, true))
    val m = GroupTests.mcnemar(rows.toDF("g", "a", "b"), "g", "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("z").isNullAt(m("z").fieldIndex("chi2")))
    // b=1, c=2: chi2 = 1/3 floored at ppm
    assert(m("f").getAs[Long]("chi2_ppm") == 333333L)
  }

  // ---- Cochran's Q ----

  test("Cochran's Q hand case: T=(4,2,1) over 4 blocks gives 28/6") {
    val blocks = Seq(
      ("b1", Seq(1, 1, 0)), ("b2", Seq(1, 0, 0)),
      ("b3", Seq(1, 1, 1)), ("b4", Seq(1, 0, 0)))
    val rows = blocks.flatMap { case (b, xs) =>
      xs.zipWithIndex.map { case (x, t) => ("f", b, t.toLong, x == 1) }
    }
    val r = GroupTests.cochranQ(rows.toDF("g", "b", "trt", "x"),
      "g", "b", "trt", "x").collect().head
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Long]("num") == 28L && r.getAs[Long]("den") == 6L)
    assert(r.getAs[Double]("q") == 4.666667)
  }

  test("Cochran's Q: all-success blocks give null; refusals fire") {
    val allTrue = (1 to 3).flatMap(b =>
      (0 to 2).map(t => ("f", s"b$b", t.toLong, true)))
    val r = GroupTests.cochranQ(allTrue.toDF("g", "b", "trt", "x"),
      "g", "b", "trt", "x").collect().head
    assert(r.isNullAt(r.fieldIndex("q")))
    val dup = allTrue ++ Seq(("f", "b1", 0L, false))
    assert(SparkTestSession.refusalMessage {
      GroupTests.cochranQ(dup.toDF("g", "b", "trt", "x"),
        "g", "b", "trt", "x").collect()
    }.contains("multiple"))
    val incomplete = allTrue.drop(1)
    assert(SparkTestSession.refusalMessage {
      GroupTests.cochranQ(incomplete.toDF("g", "b", "trt", "x"),
        "g", "b", "trt", "x").collect()
    }.contains("incomplete"))
  }

  // ---- gamma / Somers' D ----

  test("gamma/Somers hand case: y ties penalize d_yx only") {
    // (0,0), (1,0), (2,1): one x-tied-free pair set, one y tie
    val df = Seq(("f", 0L, 0L), ("f", 1L, 0L), ("f", 2L, 1L))
      .toDF("g", "x", "y")
    val r = RankCorr.gammaSomers(df, "g", "x", "y").collect().head
    assert(r.getAs[Long]("s") == 4L) // 2(C−D), C=2 D=0
    assert(r.getAs[Double]("gamma") == 1.0)
    assert(r.getAs[Double]("d_yx") == 0.666667) // 4/6: y ties penalized
    assert(r.getAs[Double]("d_xy") == 1.0)      // 4/(6−2): x has no ties
  }

  test("gamma: perfect 2x2 association gives 1; s == kendallTauB's s") {
    val rows = (1 to 120).map(i =>
      ("f", (i * 7 % 5).toLong, (i * 11 % 4).toLong))
    val df = rows.toDF("g", "x", "y")
    val g = RankCorr.gammaSomers(df, "g", "x", "y").collect().head
    val k = RankCorr.kendallTauB(df, "g", "x", "y").collect().head
    assert(g.getAs[Long]("s") == k.getAs[Long]("s"))
    val perfect = Seq(("f", 0L, 0L), ("f", 0L, 0L), ("f", 1L, 1L),
      ("f", 1L, 1L)).toDF("g", "x", "y")
    val p = RankCorr.gammaSomers(perfect, "g", "x", "y").collect().head
    assert(p.getAs[Double]("gamma") == 1.0 &&
      p.getAs[Double]("d_yx") == 1.0 && p.getAs[Double]("d_xy") == 1.0)
  }

  // ---- Page's trend test ----

  test("Page hand case: two perfectly ordered blocks of K=3 give z = 2") {
    val rows = for (b <- Seq("b1", "b2"); t <- 0 to 2)
      yield ("f", b, t.toLong, (t + 1).toLong * 10)
    val r = RankCorr.pageTrend(rows.toDF("g", "b", "trt", "v"),
      "g", "b", "trt", "v").collect().head
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n_blocks") == 2L)
    assert(r.getAs[Long]("l2") == 56L) // 2L = 2·(1·1+2·2+3·3) per block
    assert(r.getAs[Double]("z") == 2.0)
  }

  test("Page: reversed order flips z; friedman refusals apply") {
    val fwd = for (b <- 1 to 4; t <- 0 to 3)
      yield ("f", s"b$b", t.toLong, (t * 7 % 9).toLong + t)
    val rev = fwd.map { case (g, b, t, v) => (g, b, 3L - t, v) }
    val zf = RankCorr.pageTrend(fwd.toDF("g", "b", "trt", "v"),
      "g", "b", "trt", "v").collect().head.getAs[Double]("z")
    val zr = RankCorr.pageTrend(rev.toDF("g", "b", "trt", "v"),
      "g", "b", "trt", "v").collect().head.getAs[Double]("z")
    assert(math.abs(zf + zr) < 1e-9, s"$zf vs $zr")
    assert(SparkTestSession.refusalMessage {
      RankCorr.pageTrend(fwd.drop(1).toDF("g", "b", "trt", "v"),
        "g", "b", "trt", "v").collect()
    }.contains("incomplete"))
  }

  // ---- Theil–Sen ----

  test("Theil-Sen is outlier-immune where least squares is not") {
    // y = x with one wild outlier: slope stays exactly 1, intercept 0
    val df = Seq(("f", 1L, 1L), ("f", 2L, 2L), ("f", 3L, 3L),
      ("f", 4L, 100L)).toDF("g", "x", "y")
    val r = RobustStats.theilSen(df, "g", "x", "y").collect().head
    assert(r.getAs[Long]("n_points") == 4L && r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Double]("slope") == 1.0)
    assert(r.getAs[Double]("intercept") == 0.0)
  }

  test("Theil-Sen lower-median convention and maxPoints refusal") {
    // slopes (1, 4.5, 8): even count not reached — 3 pairs, position 2
    val df = Seq(("f", 1L, 1L), ("f", 2L, 2L), ("f", 3L, 10L))
      .toDF("g", "x", "y")
    val r = RobustStats.theilSen(df, "g", "x", "y").collect().head
    assert(r.getAs[Double]("slope") == 4.5)
    assert(SparkTestSession.refusalMessage {
      RobustStats.theilSen(df, "g", "x", "y", maxPoints = 2L).collect()
    }.contains("maxPoints"))
  }

  test("Theil-Sen partitioning invariance") {
    val rows = (1 to 60).map(i =>
      ("g" + (i % 2), i.toLong, (i * 31 % 97).toLong))
    def run(parts: Int): Seq[String] =
      RobustStats.theilSen(rows.toDF("g", "x", "y").repartition(parts),
        "g", "x", "y").collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(13))
  }

  // ---- Kendall's W ----

  test("Kendall's W: identically-ranked blocks give W = 1; friedman " +
      "chi2 relation holds") {
    val agree = for (b <- Seq("b1", "b2"); t <- 0 to 2)
      yield ("f", b, t.toLong, (t + 1).toLong * 10)
    val r = RankCorr.kendallW(agree.toDF("g", "b", "trt", "v"),
      "g", "b", "trt", "v").collect().head
    assert(r.getAs[Double]("w") == 1.0, r.toString)
    // W == chi2 / (n_blocks·(k−1)) against friedman on shared data
    val rows = for (b <- 1 to 5; t <- 0 to 3)
      yield ("f", s"b$b", t.toLong, ((b * 7 + t * 13) % 11).toLong)
    val w = RankCorr.kendallW(rows.toDF("g", "b", "trt", "v"),
      "g", "b", "trt", "v").collect().head
    val f = RankCorr.friedman(rows.toDF("g", "b", "trt", "v"),
      "g", "b", "trt", "v").collect().head
    assert(math.abs(w.getAs[Double]("w") -
      f.getAs[Double]("chi2") / (5.0 * 3.0)) < 2e-6)
  }

  // ---- Mann–Whitney ----

  test("MW hand case: A=(1,2,3) B=(4,5,6) gives u2=0, z = -1.963961") {
    val df = Seq(("f", "A", 1L), ("f", "A", 2L), ("f", "A", 3L),
      ("f", "B", 4L), ("f", "B", 5L), ("f", "B", 6L)).toDF("g", "s", "v")
    val r = RankCorr.mannWhitney(df, "g", "s", "v", "A").collect().head
    assert(r.getAs[Long]("na") == 3L && r.getAs[Long]("nb") == 3L)
    assert(r.getAs[Long]("u2") == 0L)
    assert(r.getAs[Double]("z") == -1.963961, r.toString)
  }

  test("MW tie correction: A=(1,1) B=(2,2) gives z = -sqrt(3)") {
    val df = Seq(("f", "A", 1L), ("f", "A", 1L),
      ("f", "B", 2L), ("f", "B", 2L)).toDF("g", "s", "v")
    val r = RankCorr.mannWhitney(df, "g", "s", "v", "A").collect().head
    assert(r.getAs[Long]("u2") == 0L)
    assert(r.getAs[Double]("z") == -1.732051, r.toString)
  }

  test("MW: H == z² at k=2 (cross-operator identity); fully tied null; " +
      "two-sample refusal") {
    val rows = (1 to 100).map(i =>
      ("f", if (i % 2 == 0) "A" else "B", (i * 37 % 23).toLong))
    val df = rows.toDF("g", "s", "v")
    val z = RankCorr.mannWhitney(df, "g", "s", "v", "A")
      .collect().head.getAs[Double]("z")
    val h = RankCorr.kruskalWallis(df, "g", "s", "v")
      .collect().head.getAs[Double]("h")
    // identical up to KW's per-sample ⌊(2R_j)²/n_j⌋ floors (each
    // loses <1 unit, so |H − z²| < 3·12/(N(N+1)) ≈ 4e-3 at N=100)
    assert(math.abs(h - z * z) < 4e-3, s"H=$h z²=${z * z}")
    val tied = Seq(("f", "A", 1L), ("f", "B", 1L)).toDF("g", "s", "v")
    val rt = RankCorr.mannWhitney(tied, "g", "s", "v", "A").collect().head
    assert(rt.isNullAt(rt.fieldIndex("z")))
    assert(SparkTestSession.refusalMessage {
      RankCorr.mannWhitney(
        (rows :+ (("f", "C", 1L))).toDF("g", "s", "v"),
        "g", "s", "v", "A").collect()
    }.contains("exactly two samples"))
  }

  // ---- skewness / kurtosis ----

  test("skewKurtosis hand case: (0,0,0,1) gives g1 = 2/sqrt(3), " +
      "g2 = -2/3") {
    val df = Seq(("f", 0L), ("f", 0L), ("f", 0L), ("f", 1L)).toDF("g", "v")
    val r = GroupTests.skewKurtosis(df, "g", "v").collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("a2") == 3L)
    assert(r.getAs[Double]("skewness") == 1.154701, r.toString)
    assert(r.getAs[Double]("kurtosis_excess") == -0.666667, r.toString)
  }

  test("skewKurtosis: symmetric data has zero skew; constant gives " +
      "nulls; quartic refusal fires") {
    val df = Seq(("f", 1L), ("f", 2L), ("f", 3L),
      ("c", 7L), ("c", 7L)).toDF("g", "v")
    val m = GroupTests.skewKurtosis(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("f").getAs[Double]("skewness") == 0.0)
    assert(m("c").isNullAt(m("c").fieldIndex("skewness")))
    val big = (1 to 100).map(i => ("f", 1000000000L + i)).toDF("g", "v")
    assert(SparkTestSession.refusalMessage {
      GroupTests.skewKurtosis(big, "g", "v").collect()
    }.contains("quartic"))
  }

  // ---- Brown–Forsythe ----

  test("BF hand case: A=(1,1,1) vs B=(0,4,8) gives F = 4") {
    val df = Seq(("f", "A", 1L), ("f", "A", 1L), ("f", "A", 1L),
      ("f", "B", 0L), ("f", "B", 4L), ("f", "B", 8L)).toDF("g", "s", "v")
    val r = GroupTests.brownForsythe(df, "g", "s", "v").collect().head
    // medians 1 and 4 → z_A=(0,0,0), z_B=(4,0,4); SSB=11, SSW=11
    assert(r.getAs[Long]("ssb") == 11L && r.getAs[Long]("ssw") == 11L)
    assert(r.getAs[Double]("f") == 4.0)
  }

  test("BF sees spread, not location: shifted copies give F = 0") {
    val df = Seq(("f", "A", 1L), ("f", "A", 1L), ("f", "A", 5L),
      ("f", "B", 10L), ("f", "B", 10L), ("f", "B", 14L))
      .toDF("g", "s", "v")
    val r = GroupTests.brownForsythe(df, "g", "s", "v").collect().head
    assert(r.getAs[Long]("ssb") == 0L)
    // identical deviation profiles: zero between-sample variance
    assert(r.getAs[Double]("f") == 0.0)
  }

  test("BF partitioning invariance (exact integers end-to-end)") {
    val rows = (1 to 240).map(i =>
      ("f" + (i % 2), "s" + (i % 3), (i * 37 % 53).toLong))
    def run(parts: Int): Seq[String] =
      GroupTests.brownForsythe(rows.toDF("g", "s", "v").repartition(parts),
        "g", "s", "v").collect().map(_.toString).sorted.toSeq
    assert(run(1) == run(11))
  }
}

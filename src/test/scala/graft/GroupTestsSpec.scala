package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GroupTests, RankCorr}

/** K-sample test battery: Kruskal–Wallis
  * ([[RankCorr.kruskalWallis]]), one-way ANOVA
  * ([[GroupTests.anovaOneWay]]), Mood's median test
  * ([[GroupTests.moodMedianTest]]), and Cramér's V
  * ([[GroupTests.cramersV]]) — hand values, tie/degenerate regimes,
  * family isolation, partitioning invariance, and the KW magnitude
  * refusal.
  */
class GroupTestsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- Kruskal–Wallis ----

  test("KW hand case, no ties: A=(1,2,3) B=(4,5,6) gives H = 27/7") {
    val df = Seq(("f", "A", 1L), ("f", "A", 2L), ("f", "A", 3L),
      ("f", "B", 4L), ("f", "B", 5L), ("f", "B", 6L)).toDF("g", "s", "v")
    val r = RankCorr.kruskalWallis(df, "g", "s", "v").collect().head
    // ranks 1..6, R_A = 6, R_B = 15; H = 12/(6·7)·(12+75) − 21
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("rsq_sum") == 48L + 300L)
    assert(r.getAs[Long]("t3t") == 0L)
    assert(math.abs(r.getAs[Double]("h") - 27.0 / 7.0) < 5e-7, r.toString)
  }

  test("KW tie correction: A=(1,1) B=(2,2) gives H = 2.4/0.8 = 3") {
    val df = Seq(("f", "A", 1L), ("f", "A", 1L),
      ("f", "B", 2L), ("f", "B", 2L)).toDF("g", "s", "v")
    val r = RankCorr.kruskalWallis(df, "g", "s", "v").collect().head
    // midranks 1.5/1.5/3.5/3.5 → 2R = (6, 14); t3t = 6 + 6 = 12;
    // H_unc = 3·(18+98)/20 − 15 = 2.4; corr = 1 − 12/60 = 0.8
    assert(r.getAs[Long]("t3t") == 12L)
    assert(math.abs(r.getAs[Double]("h") - 3.0) < 5e-7, r.toString)
  }

  test("KW: fully tied family yields null H; families are isolated") {
    val df = Seq(("t", "A", 5L), ("t", "B", 5L), ("t", "B", 5L),
      ("f", "A", 1L), ("f", "A", 2L), ("f", "A", 3L),
      ("f", "B", 4L), ("f", "B", 5L), ("f", "B", 6L)).toDF("g", "s", "v")
    val m = RankCorr.kruskalWallis(df, "g", "s", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("t").isNullAt(m("t").fieldIndex("h")))
    assert(math.abs(m("f").getAs[Double]("h") - 27.0 / 7.0) < 5e-7)
  }

  test("KW partitioning invariance") {
    val rows = (1 to 200).map(i =>
      (s"f${i % 3}", s"s${i % 4}", (i * 37 % 23).toLong))
    val a = RankCorr.kruskalWallis(rows.toDF("g", "s", "v"), "g", "s", "v")
      .collect().map(_.toString).sorted
    val b = RankCorr.kruskalWallis(
        rows.toDF("g", "s", "v").repartition(13), "g", "s", "v")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("KW refuses families beyond the BIGINT magnitude cap") {
    val df = Seq(("f", "A", 1L), ("f", "B", 2L)).toDF("g", "s", "v")
    val e = SparkTestSession.refusalMessage {
      RankCorr.kruskalWallis(df, "g", "s", "v", maxFamilyN = 1L).collect()
    }
    assert(e.contains("maxFamilyN") && e.contains("family f"), e)
  }

  // ---- one-way ANOVA ----

  test("ANOVA hand case: A=(1,2,3) B=(7,8,9) gives F = 54, eta2 = 54/58") {
    val df = Seq(("f", "A", 1L), ("f", "A", 2L), ("f", "A", 3L),
      ("f", "B", 7L), ("f", "B", 8L), ("f", "B", 9L)).toDF("g", "s", "v")
    val r = GroupTests.anovaOneWay(df, "g", "s", "v").collect().head
    // S_A = 6, Q_A = 14; S_B = 24, Q_B = 194; bsum = 12 + 192 = 204;
    // S²/n = 900/6 = 150 → SSB = 54, SSW = 208 − 204 = 4
    assert(r.getAs[Long]("ssb") == 54L && r.getAs[Long]("ssw") == 4L,
      r.toString)
    // F = (54/1)/(4/4) = 54; eta2 = 54/58
    assert(math.abs(r.getAs[Double]("f") - 54.0) < 5e-7)
    assert(math.abs(r.getAs[Double]("eta2") - 54.0 / 58.0) < 5e-7)
  }

  test("ANOVA: zero within-variance gives null F and eta2 = 1") {
    val df = Seq(("f", "A", 1L), ("f", "A", 1L),
      ("f", "B", 5L), ("f", "B", 5L)).toDF("g", "s", "v")
    val r = GroupTests.anovaOneWay(df, "g", "s", "v").collect().head
    assert(r.isNullAt(r.fieldIndex("f")))
    assert(r.getAs[Double]("eta2") == 1.0)
  }

  test("ANOVA: single sample gives null F and null eta2 on zero SSB") {
    val df = Seq(("f", "A", 1L), ("f", "A", 2L)).toDF("g", "s", "v")
    val r = GroupTests.anovaOneWay(df, "g", "s", "v").collect().head
    assert(r.getAs[Long]("k") == 1L && r.isNullAt(r.fieldIndex("f")))
  }

  // ---- Mood's median test ----

  test("Mood hand case: complete separation at n=8 gives chi2 = 8") {
    val df = Seq(("f", "A", 1L), ("f", "A", 2L), ("f", "A", 3L),
      ("f", "A", 4L), ("f", "B", 5L), ("f", "B", 6L), ("f", "B", 7L),
      ("f", "B", 8L)).toDF("g", "s", "v")
    val r = GroupTests.moodMedianTest(df, "g", "s", "v").collect().head
    // lower median position (8+1) DIV 2 = 4 → median 4; above: A 0, B 4;
    // all four cells have e = 2, (o−e)²/e = 2 → chi2 = 8
    assert(r.getAs[Long]("median") == 4L)
    assert(r.getAs[Long]("chi2_ppm") == 8000000L, r.toString)
    assert(r.getAs[Double]("chi2") == 8.0)
  }

  test("Mood: identical samples give chi2 = 0; constant family gives null") {
    val df = Seq(("f", "A", 1L), ("f", "A", 2L), ("f", "B", 1L),
      ("f", "B", 2L),
      ("c", "A", 5L), ("c", "B", 5L)).toDF("g", "s", "v")
    val m = GroupTests.moodMedianTest(df, "g", "s", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("f").getAs[Long]("chi2_ppm") == 0L)
    // constant family: every value ≤ median → empty 'above' margin
    assert(m("c").isNullAt(m("c").fieldIndex("chi2_ppm")))
  }

  // ---- Cramér's V ----

  test("V hand case: perfect 2x2 association gives chi2 = n and v = 1") {
    val df = Seq(("f", "r1", "c1"), ("f", "r1", "c1"),
      ("f", "r2", "c2"), ("f", "r2", "c2")).toDF("g", "r", "c")
    val r = GroupTests.cramersV(df, "g", "r", "c").collect().head
    assert(r.getAs[Long]("chi2_ppm") == 4000000L, r.toString)
    assert(r.getAs[Double]("v") == 1.0)
  }

  test("V: independent 2x2 gives chi2 = 0; structural zeros contribute") {
    val ind = Seq(("f", "r1", "c1"), ("f", "r1", "c2"),
      ("f", "r2", "c1"), ("f", "r2", "c2")).toDF("g", "r", "c")
    val r1 = GroupTests.cramersV(ind, "g", "r", "c").collect().head
    assert(r1.getAs[Long]("chi2_ppm") == 0L && r1.getAs[Double]("v") == 0.0)
    // the perfect-association case above only works because the (r1,c2)
    // and (r2,c1) ZERO cells contribute their expected mass — drop the
    // dense grid and chi2 would halve; pin the dense-grid contract by
    // the exact ppm value (already asserted) and a 2x3 with a hole:
    val hole = Seq(("f", "r1", "c1"), ("f", "r1", "c2"), ("f", "r1", "c3"),
      ("f", "r2", "c1"), ("f", "r2", "c2")).toDF("g", "r", "c")
    val r2 = GroupTests.cramersV(hole, "g", "r", "c").collect().head
    // marginals: r1=3, r2=2; c1=2, c2=2, c3=1; n=5; the (r2,c3) cell is
    // o=0 with expected 2/5 — its exact contribution is
    // ⌊(0·5 − 2·1)²·10⁶/(5·2·1)⌋ = 400000
    assert(r2.getAs[Long]("n_rows") == 2L && r2.getAs[Long]("n_cols") == 3L)
    assert(r2.getAs[Long]("chi2_ppm") >= 400000L)
  }

  // ---- Cochran–Mantel–Haenszel ----

  private def cmhRows(reps: Seq[(String, Boolean, Boolean, Int)]) =
    reps.flatMap { case (g, x, y, n) => Seq.fill(n)((g, x, y)) }
      .toDF("g", "x", "y")

  test("CMH hand case: two identical balanced strata") {
    val df = cmhRows(Seq(
      ("s1", true, true, 10), ("s1", true, false, 5),
      ("s1", false, true, 5), ("s1", false, false, 10),
      ("s2", true, true, 10), ("s2", true, false, 5),
      ("s2", false, true, 5), ("s2", false, false, 10)))
    val r = GroupTests.cmh(df, "g", "x", "y").head()
    // per stratum: e = 15·15·10⁶//30 = 7,500,000;
    // v = 15⁴·10⁶//(30·30·29) = 1,939,655 (floored)
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("o") == 20L)
    assert(r.getAs[Long]("e_ppm") == 15000000L)
    assert(r.getAs[Long]("v_ppm") == 2L * 1939655L, r.toString)
    assert(math.abs(r.getAs[Double]("chi2") - 25.0 / 3.87931) < 1e-5)
    // OR_MH: Σ(a·d/n)/Σ(b·c/n) = 6,666,666/1,666,666 → 4.000001
    assert(r.getAs[Long]("or_num_ppm") == 6666666L)
    assert(r.getAs[Long]("or_den_ppm") == 1666666L)
    assert(r.getAs[Double]("or_mh") == 4.000001)
  }

  test("CMH: zero variance (everyone exposed) gives null chi2") {
    val df = cmhRows(Seq(("s1", true, true, 3), ("s1", true, false, 2)))
    val r = GroupTests.cmh(df, "g", "x", "y").head()
    assert(r.getAs[Long]("v_ppm") == 0L)
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("CMH: no association within strata gives chi2 ~ 0") {
    // both strata have OR = 1 (a·d = b·c) at different base rates
    val df = cmhRows(Seq(
      ("s1", true, true, 8), ("s1", true, false, 8),
      ("s1", false, true, 4), ("s1", false, false, 4),
      ("s2", true, true, 2), ("s2", true, false, 6),
      ("s2", false, true, 3), ("s2", false, false, 9)))
    val r = GroupTests.cmh(df, "g", "x", "y").head()
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-4, r.toString)
    assert(math.abs(r.getAs[Double]("or_mh") - 1.0) < 1e-4)
  }

  // ---- Friedman ----

  test("Friedman hand case, no ties: two (1,2,3)-ranked blocks give chi2 = 4") {
    val df = Seq(("f", "b1", "t1", 1L), ("f", "b1", "t2", 2L),
      ("f", "b1", "t3", 3L), ("f", "b2", "t1", 4L),
      ("f", "b2", "t2", 5L), ("f", "b2", "t3", 6L))
      .toDF("g", "b", "t", "v")
    val r = RankCorr.friedman(df, "g", "b", "t", "v").head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n_blocks") == 2L)
    assert(r.getAs[Long]("num") == 64L && r.getAs[Long]("den") == 16L)
    assert(r.getAs[Double]("chi2") == 4.0)
  }

  test("Friedman midrank ties: tied block gives the corrected 52/14") {
    val df = Seq(("f", "b1", "t1", 1L), ("f", "b1", "t2", 2L),
      ("f", "b1", "t3", 3L), ("f", "b2", "t1", 4L),
      ("f", "b2", "t2", 4L), ("f", "b2", "t3", 9L))
      .toDF("g", "b", "t", "v")
    val r = RankCorr.friedman(df, "g", "b", "t", "v").head()
    // doubled midranks: (2,4,6) and (3,3,6) → 2R = (5,7,12);
    // num = 2·((5−8)² + (7−8)² + (12−8)²) = 52; den = 110 − 96 = 14
    assert(r.getAs[Long]("num") == 52L && r.getAs[Long]("den") == 14L)
    assert(math.abs(r.getAs[Double]("chi2") - 52.0 / 14.0) < 5e-7)
  }

  test("Friedman: fully tied blocks give null; refusals fire") {
    val tied = Seq(("f", "b1", "t1", 5L), ("f", "b1", "t2", 5L),
      ("f", "b2", "t1", 7L), ("f", "b2", "t2", 7L)).toDF("g", "b", "t", "v")
    val r = RankCorr.friedman(tied, "g", "b", "t", "v").head()
    assert(r.getAs[Long]("den") == 0L && r.isNullAt(r.fieldIndex("chi2")))
    val dup = Seq(("f", "b1", "t1", 1L), ("f", "b1", "t1", 2L),
      ("f", "b1", "t2", 3L)).toDF("g", "b", "t", "v")
    assert(SparkTestSession.refusalMessage {
      RankCorr.friedman(dup, "g", "b", "t", "v").collect()
    }.contains("multiple"))
    val incomplete = Seq(("f", "b1", "t1", 1L), ("f", "b1", "t2", 2L),
      ("f", "b2", "t1", 3L)).toDF("g", "b", "t", "v")
    assert(SparkTestSession.refusalMessage {
      RankCorr.friedman(incomplete, "g", "b", "t", "v").collect()
    }.contains("incomplete"))
  }

  // ---- Jonckheere–Terpstra ----

  test("JT hand case: perfectly ordered two samples give z = 1.549193") {
    val df = Seq(("f", 1L, 1L), ("f", 1L, 2L), ("f", 2L, 3L),
      ("f", 2L, 4L)).toDF("g", "smp", "v")
    val r = RankCorr.jonckheereTerpstra(df, "g", "smp", "v").head()
    // all 4 cross pairs concordant → s = 2(C−D) = 8;
    // var = (4·3·13 − 0 − 36)/18 = 20/3; z = 8/(2·sqrt(20/3))
    assert(r.getAs[Long]("s") == 8L, r.toString)
    assert(r.getAs[Double]("z") == 1.549193)
    // anti-trend mirrors exactly
    val anti = Seq(("f", 1L, 3L), ("f", 1L, 4L), ("f", 2L, 1L),
      ("f", 2L, 2L)).toDF("g", "smp", "v")
    val r2 = RankCorr.jonckheereTerpstra(anti, "g", "smp", "v").head()
    assert(r2.getAs[Long]("s") == -8L && r2.getAs[Double]("z") == -1.549193)
  }

  test("JT tie-corrected variance hand case: z = 1 exactly") {
    // samples 1:(1,1), 2:(1,2): C−D = 2 → s = 4; t-sums (66, 6, 6),
    // u-sums (36, 4, 0) → var = (156−102)/18 + 0 + 24/24 = 4 → z = 1
    val df = Seq(("f", 1L, 1L), ("f", 1L, 1L), ("f", 2L, 1L),
      ("f", 2L, 2L)).toDF("g", "smp", "v")
    val r = RankCorr.jonckheereTerpstra(df, "g", "smp", "v").head()
    assert(r.getAs[Long]("s") == 4L && r.getAs[Double]("z") == 1.0,
      r.toString)
  }

  test("JT s equals kendallTauB's S on the same (order, value) pairs") {
    val rows = (1 to 120).map(i =>
      (s"f${i % 2}", (i % 4).toLong + 1, (i * 13 % 17).toLong))
    val df = rows.toDF("g", "smp", "v")
    val jt = RankCorr.jonckheereTerpstra(df, "g", "smp", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("s")).toMap
    val kd = RankCorr.kendallTauB(df, "g", "smp", "v").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("s")).toMap
    assert(jt == kd, s"$jt vs $kd")
  }

  test("JT partitioning invariance and family isolation") {
    val rows = (1 to 100).map(i =>
      (s"f${i % 3}", (i % 5).toLong, (i * 7 % 13).toLong))
    def run(parts: Int): Set[String] =
      RankCorr.jonckheereTerpstra(rows.toDF("g", "smp", "v")
        .repartition(parts), "g", "smp", "v")
        .collect().map(_.toString).toSet
    assert(run(1) == run(9))
  }

  test("JT composite key is injective: a family CONTAINING the " +
      "separator never merges with its neighbors") {
    // "x\u00012" contains the internal separator; under a plain
    // fam+sep+smp concat it could collide with other keys — the
    // length-prefixed key keeps every (family, sample) group distinct
    val plain = Seq(("x", 1L, 1L), ("x", 1L, 2L), ("x", 2L, 5L),
      ("x", 2L, 6L))
    val tricky = plain.map { case (_, s, v) => ("x\u00012", s, v) }
    val both = (plain ++ tricky).toDF("g", "smp", "v")
    val got = RankCorr.jonckheereTerpstra(both, "g", "smp", "v")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("s")).toMap
    val solo = RankCorr.jonckheereTerpstra(plain.toDF("g", "smp", "v"),
      "g", "smp", "v").collect().head.getAs[Long]("s")
    assert(got.size == 2 && got("x") == solo && got("x\u00012") == solo,
      got.toString)
  }

  test("Mood/V/CMH magnitude refusals fire ABOVE 1.9e8 — a NULL-" +
      "skipping SUM would otherwise report a wrong non-null chi2") {
    import org.apache.spark.sql.functions.{col, lit}
    // planted count cells: the guards scan aggregated counts, so the
    // over-cap regime is testable without 2e8 physical rows
    val moodCells = Seq(("f", "A", 1L, 100000000L),
      ("f", "B", 2L, 150000000L)).toDF("g", "smp", "v", "cnt")
    val e1 = SparkTestSession.refusalMessage {
      GroupTests.moodFromCells(moodCells, "fam").collect()
    }
    assert(e1.contains("1.9e8"), e1)
    val vCells = Seq(("f", "r1", "c1", 191000000L),
      ("f", "r2", "c2", 1L)).toDF("g", "r", "c", "o")
    val e2 = SparkTestSession.refusalMessage {
      GroupTests.cramersVFromCells(vCells, "fam").collect()
    }
    assert(e2.contains("1.9e8"), e2)
    // CMH boundary tightened: a stratum AT 2e8 would put the balanced
    // v_ppm numerator at exactly 10^38 — past DECIMAL(38,0) max
    val strata = Seq(("s1", 95500000L, 95500000L, 0L, 0L))
      .toDF("g", "a", "b", "c", "d")
    val e3 = SparkTestSession.refusalMessage {
      GroupTests.cmhFromStrata(strata).collect()
    }
    assert(e3.contains("1.9e8"), e3)
    // sub-cap still computes
    val ok = Seq(("f", "A", 1L, 10L), ("f", "B", 2L, 10L))
      .toDF("g", "smp", "v", "cnt")
    assert(GroupTests.moodFromCells(ok, "fam").count() == 1L)
  }

  test("ANOVA refuses BEFORE the decimal algebra when a moment bound " +
      "reaches DECIMAL(38,0) range") {
    // v = 1e18, 100 rows: n_j·max(v)² = 1e38 — without the pre-scan
    // the engine throws mid-aggregation (ANSI) or NULL-skips (no ANSI)
    val big = (1 to 100).flatMap(_ =>
      Seq(("f", "A", 1000000000000000000L), ("f", "B", 1L)))
      .toDF("g", "s", "v")
    val e = SparkTestSession.refusalMessage {
      GroupTests.anovaOneWay(big, "g", "s", "v").collect()
    }
    assert(e.contains("rescale"), e)
  }

  test("ANOVA adversarial near-bound: the SQUARE s_j² can overflow " +
      "where the old per-sample n_j·max(v²) bound still passed — the " +
      "family (n·max|v|)² guard refuses instead of silently nulling") {
    // one cell: cnt = 4e9, v = 3e9 → s_j = 1.2e19, s_j² = 1.44e38 >
    // DECIMAL(38,0) max, yet n_j·max(v²) = 4e9 · 9e18 = 3.6e28 ≪ 9e37
    // (the r15-certified guard would have let this through to an
    // ANSI mid-job arithmetic error / non-ANSI NULL-skipping SUM)
    val cells = Seq(("f", "A", 3000000000L, 4000000000L))
      .toDF("g", "smp", "v", "cnt")
    val e = SparkTestSession.refusalMessage {
      GroupTests.anovaFromCells(cells, "fam").collect()
    }
    assert(e.contains("rescale") && e.contains("(n*max|v|)^2"), e)
  }

  test("skewKurtosis widened partial-sum margin: 16·B⁴ refuses inputs " +
      "the old 6·B⁴ constant accepted") {
    // B = n·max|v| = 1600 · 1e6 = 1.6e9: 16·B⁴ ≈ 1.05e38 ≥ 9e37
    // (refuse) while 6·B⁴ ≈ 3.9e37 < 9e37 (the old guard passed)
    val df = (1 to 1600).map(i => ("f", 1000000L - i)).toDF("g", "v")
    val e = SparkTestSession.refusalMessage {
      GroupTests.skewKurtosis(df, "g", "v").collect()
    }
    assert(e.contains("16*(n*max|v|)^4"), e)
  }

  test("battery partitioning invariance (ANOVA + Mood + V)") {
    val rows = (1 to 300).map(i =>
      (s"f${i % 2}", s"s${i % 5}", (i * 31 % 97).toLong))
    def run(parts: Int): Seq[String] = {
      val df = rows.toDF("g", "s", "v").repartition(parts)
      (GroupTests.anovaOneWay(df, "g", "s", "v").collect() ++
        GroupTests.moodMedianTest(df, "g", "s", "v").collect() ++
        GroupTests.cramersV(df.withColumn("c",
          org.apache.spark.sql.functions.col("v") % 3), "g", "s", "c")
          .collect()).map(_.toString).sorted.toSeq
    }
    assert(run(1) == run(17))
  }
}

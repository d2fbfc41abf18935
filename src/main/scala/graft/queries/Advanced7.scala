package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DailySeries, GraphOps, GroupTests, RankCorr, StatTests, Survival}
import graft.sources.TableCatalog._

/** Round-14 (continued) additions: the K-sample test battery
  * (Kruskal–Wallis / one-way ANOVA / Mood's median / Cramér's V) on
  * exact sufficient statistics, market-concentration HHI,
  * Benjamini–Hochberg FDR over the per-nation Wilcoxon family, Cox
  * proportional hazards, and Holt linear-trend forecasting.
  *
  * Same oracle-parity discipline as [[Advanced6]]: exact integer /
  * DECIMAL statistics everywhere, rationals floored at a declared
  * scale (ppm / unit) as single integral divisions identical across
  * engines, doubles only in a final fixed IEEE formula shared
  * verbatim with the DuckDB oracle.
  */
object Advanced7 {

  type Q = (SparkSession, String) => DataFrame

  /** Orders joined to their customer's market segment, with exact
    * cents and whole-dollar totals — the shared input of the
    * K-sample battery (fam = order year, samples = segments).
    */
  private def orderSegments(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), Seq("o_custkey"))
      .select(year(col("o_orderdate")).as("yr"), col("seg"),
        col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        round(col("o_totalprice")).cast("long").as("dollars"))

  private val orderSegmentsSql: String =
    """os AS (SELECT EXTRACT(year FROM o_orderdate) AS yr,
      |        c_mktsegment AS seg, o_orderpriority AS prio,
      |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |        CAST(round(o_totalprice) AS BIGINT) AS dollars
      |      FROM orders JOIN customer ON c_custkey = o_custkey)""".stripMargin

  // ---- q155: Kruskal–Wallis H per order year — "do the five market
  //      segments' order values share a location?" asked the rank
  //      way (outlier-immune, distribution-free). Pooled doubled
  //      midranks off the shared count-table machinery; the
  //      rank-square term enters as Σ⌊(2R_j)²/n_j⌋ exact integers;
  //      tie-corrected H is the ONE shared double formula. ----
  val q155KruskalWallis: Q = (s, d) =>
    RankCorr.kruskalWallis(orderSegments(s, d), "yr", "seg", "cents")
      .orderBy(col("yr"))

  val q155Oracle: String =
    s"""WITH $orderSegmentsSql,
      |cells AS (SELECT yr, seg, cents AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      |      FROM os GROUP BY 1, 2, 3),
      |pooled AS (SELECT yr, v, CAST(SUM(cnt) AS BIGINT) AS cnt
      |      FROM cells GROUP BY 1, 2),
      |m2 AS (SELECT yr, v,
      |        2 * (SUM(cnt) OVER (PARTITION BY yr ORDER BY v
      |          ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS m2
      |      FROM pooled),
      |fam AS (SELECT yr, CAST(SUM(cnt) AS BIGINT) AS n,
      |        CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS BIGINT)
      |          AS t3t
      |      FROM pooled GROUP BY 1),
      |r AS (SELECT c.yr, c.seg, CAST(SUM(c.cnt) AS BIGINT) AS n_j,
      |        SUM(CAST(c.cnt AS HUGEINT) * m2.m2) AS r2
      |      FROM cells c JOIN m2 ON c.yr = m2.yr AND c.v = m2.v
      |      GROUP BY 1, 2),
      |terms AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS k,
      |        CAST(SUM(r2 * r2 // n_j) AS BIGINT) AS rsq_sum
      |      FROM r GROUP BY 1)
      |SELECT yr, k, n, rsq_sum, t3t,
      |  CASE WHEN CAST(n AS HUGEINT) * n * n - n > t3t THEN
      |    round(${GroupTests.kwHFormulaSql}, 6)
      |  ELSE NULL END AS h
      |FROM terms JOIN fam USING (yr) ORDER BY yr""".stripMargin

  // ---- q156: one-way ANOVA F per order year across order
  //      priorities, in whole DOLLARS (the magnitude contract:
  //      S_j²/n_j must fit BIGINT) — the parametric companion of
  //      q155 with the η² effect size. SSB/SSW are order-free exact
  //      integers (per-sample ⌊S_j²/n_j⌋ floors); F and η² the two
  //      shared double formulas. ----
  val q156Anova: Q = (s, d) =>
    GroupTests.anovaOneWay(orderSegments(s, d), "yr", "prio", "dollars")
      .orderBy(col("yr"))

  val q156Oracle: String =
    s"""WITH $orderSegmentsSql,
      |per AS (SELECT yr, prio, CAST(COUNT(*) AS BIGINT) AS n_j,
      |        SUM(CAST(dollars AS HUGEINT)) AS s_j,
      |        SUM(CAST(dollars AS HUGEINT) * dollars) AS q_j
      |      FROM os GROUP BY 1, 2),
      |agg AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS k,
      |        CAST(SUM(n_j) AS BIGINT) AS n,
      |        SUM(s_j) AS s, SUM(q_j) AS q,
      |        SUM(s_j * s_j // n_j) AS bsum
      |      FROM per GROUP BY 1),
      |sq AS (SELECT yr, k, n,
      |        CAST(bsum - (s * s // n) AS BIGINT) AS ssb,
      |        CAST(q - bsum AS BIGINT) AS ssw
      |      FROM agg)
      |SELECT yr, k, n, ssb, ssw,
      |  CASE WHEN k > 1 AND n > k AND ssw > 0 THEN
      |    round(${GroupTests.anovaFFormulaSql}, 6) ELSE NULL END AS f,
      |  CASE WHEN ssb + ssw > 0 THEN
      |    round(CAST(ssb AS DOUBLE) / CAST(ssb + ssw AS DOUBLE), 6)
      |  ELSE NULL END AS eta2
      |FROM sq ORDER BY yr""".stripMargin

  // ---- q157: Mood's median test per order year across market
  //      segments — the coarsest K-sample location test (dichotomize
  //      at the pooled nearest-rank lower median, chi-square the 2×K
  //      table); survives any monotone tail contamination. chi2_ppm
  //      is an order-free exact integer (per-cell ppm floors). ----
  val q157MoodMedian: Q = (s, d) =>
    GroupTests.moodMedianTest(orderSegments(s, d), "yr", "seg", "cents")
      .orderBy(col("yr"))

  val q157Oracle: String =
    s"""WITH $orderSegmentsSql,
      |cells AS (SELECT yr, seg, cents AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      |      FROM os GROUP BY 1, 2, 3),
      |pooled AS (SELECT yr, v, CAST(SUM(cnt) AS BIGINT) AS cnt
      |      FROM cells GROUP BY 1, 2),
      |nn AS (SELECT yr, CAST(SUM(cnt) AS BIGINT) AS n FROM pooled GROUP BY 1),
      |cum AS (SELECT yr, v, cnt,
      |        SUM(cnt) OVER (PARTITION BY yr ORDER BY v
      |          ROWS UNBOUNDED PRECEDING) - cnt AS below
      |      FROM pooled),
      |med AS (SELECT cum.yr, cum.v AS med
      |      FROM cum JOIN nn USING (yr)
      |      WHERE below < (n + 1) // 2 AND (n + 1) // 2 <= below + cnt),
      |per AS (SELECT c.yr, c.seg,
      |        CAST(SUM(CASE WHEN c.v > med THEN c.cnt ELSE 0 END) AS BIGINT)
      |          AS above,
      |        CAST(SUM(c.cnt) AS BIGINT) AS n_j
      |      FROM cells c JOIN med ON c.yr = med.yr GROUP BY 1, 2),
      |marg AS (SELECT yr, CAST(SUM(above) AS BIGINT) AS r_above,
      |        CAST(SUM(n_j) AS BIGINT) AS n,
      |        CAST(COUNT(*) AS BIGINT) AS k
      |      FROM per GROUP BY 1),
      |contrib AS (SELECT per.yr, k, n, r_above,
      |        (CAST(above AS HUGEINT) * n - CAST(r_above AS HUGEINT) * n_j)
      |          * (CAST(above AS HUGEINT) * n
      |             - CAST(r_above AS HUGEINT) * n_j) AS num2,
      |        CAST(n AS HUGEINT) * r_above * n_j AS den_above,
      |        CAST(n AS HUGEINT) * (n - r_above) * n_j AS den_below
      |      FROM per JOIN marg USING (yr)),
      |chi AS (SELECT yr, k, n, r_above,
      |        CAST(SUM(CASE WHEN r_above > 0
      |            THEN num2 * 1000000 // den_above ELSE NULL END)
      |          + SUM(CASE WHEN n > r_above
      |            THEN num2 * 1000000 // den_below ELSE NULL END)
      |          AS BIGINT) AS chi2_ppm
      |      FROM contrib GROUP BY 1, 2, 3, 4)
      |SELECT chi.yr, k, n, med AS median, chi2_ppm,
      |  round(CAST(chi2_ppm AS DOUBLE) / 1000000.0, 6) AS chi2
      |FROM chi JOIN med ON chi.yr = med.yr ORDER BY chi.yr""".stripMargin

  // ---- q158: chi-square TOTAL + Cramér's V per order year over the
  //      segment × priority contingency table (q81 reports per-cell
  //      contributions; the ppm floor makes the TOTAL order-free and
  //      exact, including structural zeros' expected mass). ----
  val q158CramersV: Q = (s, d) =>
    GroupTests.cramersV(orderSegments(s, d), "yr", "seg", "prio")
      .orderBy(col("yr"))

  val q158Oracle: String =
    s"""WITH $orderSegmentsSql,
      |cells AS (SELECT yr, seg AS r, prio AS c, CAST(COUNT(*) AS BIGINT) AS o
      |      FROM os GROUP BY 1, 2, 3),
      |rm AS (SELECT yr, r, CAST(SUM(o) AS BIGINT) AS rm FROM cells GROUP BY 1, 2),
      |cm AS (SELECT yr, c, CAST(SUM(o) AS BIGINT) AS cm FROM cells GROUP BY 1, 2),
      |nn AS (SELECT yr, CAST(SUM(o) AS BIGINT) AS n,
      |        CAST(COUNT(DISTINCT r) AS BIGINT) AS n_rows,
      |        CAST(COUNT(DISTINCT c) AS BIGINT) AS n_cols
      |      FROM cells GROUP BY 1),
      |dense AS (SELECT rm.yr, rm.r, cm.c, rm.rm, cm.cm,
      |        COALESCE(o, 0) AS o, n
      |      FROM rm JOIN cm ON rm.yr = cm.yr
      |      LEFT JOIN cells ON cells.yr = rm.yr AND cells.r = rm.r
      |        AND cells.c = cm.c
      |      JOIN nn ON nn.yr = rm.yr),
      |chi AS (SELECT yr,
      |        CAST(SUM((CAST(o AS HUGEINT) * n - CAST(rm AS HUGEINT) * cm)
      |          * (CAST(o AS HUGEINT) * n - CAST(rm AS HUGEINT) * cm)
      |          * 1000000 // (CAST(n AS HUGEINT) * rm * cm)) AS BIGINT)
      |          AS chi2_ppm
      |      FROM dense GROUP BY 1)
      |SELECT yr, n, n_rows, n_cols, chi2_ppm,
      |  round(CAST(chi2_ppm AS DOUBLE) / 1000000.0, 6) AS chi2,
      |  CASE WHEN least(n_rows, n_cols) > 1 THEN
      |    round(sqrt(CAST(chi2_ppm AS DOUBLE) / 1000000.0 /
      |      (CAST(n AS DOUBLE) *
      |        CAST(least(n_rows, n_cols) - 1 AS DOUBLE))), 6)
      |  ELSE NULL END AS v
      |FROM chi JOIN nn USING (yr) ORDER BY yr""".stripMargin

  // ---- q159: Herfindahl–Hirschman supplier-concentration index per
  //      nation — Σ(revenue share)² as the order-free exact integer
  //      Σ⌊rev_s²·10⁸/rev_tot²⌋ (the antitrust-screening market-
  //      structure statistic; 1/HHI is the "effective supplier
  //      count"). ----
  val q159Hhi: Q = (s, d) => {
    val rev = lineitem(s, d)
      .join(supplier(s, d).select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey").as("nation")), Seq("l_suppkey"))
      .groupBy(col("nation"), col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .cast("decimal(38,0)").as("rev_s"))
    val tot = rev.groupBy(col("nation"))
      .agg(sum(col("rev_s")).cast("decimal(38,0)").as("rev_tot"),
        count(lit(1)).cast("bigint").as("n_suppliers"))
    rev.join(broadcast(tot), Seq("nation"))
      .select(col("nation"), col("n_suppliers"), col("rev_tot"),
        expr("CAST(rev_s * rev_s * 100000000 AS DECIMAL(38,0)) DIV " +
          "CAST(rev_tot * rev_tot AS DECIMAL(38,0))").as("term"))
      .groupBy(col("nation"), col("n_suppliers"))
      .agg(max(col("rev_tot")).cast("bigint").as("rev_cents"),
        sum(col("term")).cast("bigint").as("hhi_e8"))
      .withColumn("hhi",
        round(col("hhi_e8").cast("double") / lit(100000000.0), 9))
      .orderBy(col("nation"))
  }

  val q159Oracle: String =
    """WITH rev AS (SELECT s_nationkey AS nation, l_suppkey,
      |        SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_s
      |      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |      GROUP BY 1, 2),
      |tot AS (SELECT nation, CAST(SUM(rev_s) AS BIGINT) AS rev_tot,
      |        CAST(COUNT(*) AS BIGINT) AS n_suppliers
      |      FROM rev GROUP BY 1)
      |SELECT nation, n_suppliers, rev_tot AS rev_cents,
      |  CAST(SUM(CAST(rev_s AS HUGEINT) * rev_s * 100000000
      |    // (CAST(rev_tot AS HUGEINT) * rev_tot)) AS BIGINT) AS hhi_e8,
      |  round(CAST(SUM(CAST(rev_s AS HUGEINT) * rev_s * 100000000
      |    // (CAST(rev_tot AS HUGEINT) * rev_tot)) AS DOUBLE)
      |    / 100000000.0, 9) AS hhi
      |FROM rev JOIN tot USING (nation)
      |GROUP BY nation, n_suppliers, rev_tot
      |ORDER BY nation""".stripMargin

  // ---- q160: Benjamini–Hochberg FDR over the per-nation Wilcoxon
  //      family (q148's 1995-vs-1996 paired spend tests) — "which
  //      nations' shifts survive multiple testing at q = 0.05?".
  //      p-values via the A&S 26.2.17 normal tail SHARED as one SQL
  //      text (identical parse both engines) on z already rounded 6;
  //      the step-up suffix min folds over the 25-row test table. ----
  val q160BhFdr: Q = (s, d) => {
    val tests = Advanced6.q148Wilcoxon(s, d)
      .filter(col("z").isNotNull)
      .select(col("nation"), col("z"),
        round(expr(StatTests.normalTwoSidedPSql("z")), 9).as("p"))
    StatTests.bhAdjust(tests.select(col("nation"), col("p")),
        "nation", "p")
      .join(tests.select(col("nation"), col("z")), Seq("nation"))
      .select(col("nation"), col("z"), col("p"), col("i"), col("m"),
        col("p_adj"), col("reject"))
      .orderBy(col("i"))
  }

  val q160Oracle: String = {
    val pExpr = StatTests.normalTwoSidedPSql("z")
    s"""WITH w AS (${Advanced6.q148OracleBody}),
      |tests AS (SELECT nation, z, round($pExpr, 9) AS p
      |      FROM w WHERE z IS NOT NULL),
      |ranked AS (SELECT nation, z, p,
      |        CAST(ROW_NUMBER() OVER (ORDER BY p, nation) AS BIGINT) AS i,
      |        CAST(COUNT(*) OVER () AS BIGINT) AS m
      |      FROM tests),
      |adj AS (SELECT a.nation, a.z, a.p, a.i, a.m,
      |        round(MIN(least(1.0, CAST(b.m AS DOUBLE) * b.p
      |          / CAST(b.i AS DOUBLE))), 6) AS p_adj
      |      FROM ranked a JOIN ranked b ON b.i >= a.i
      |      GROUP BY 1, 2, 3, 4, 5)
      |SELECT nation, z, p, i, m, p_adj, p_adj <= 0.05 AS reject
      |FROM adj ORDER BY i""".stripMargin
  }

  /** Reorder gaps with customer-level covariates — the Cox input:
    * every consecutive order pair is an observed reorder event at
    * gap t; the window from the last order to the corpus end is
    * right-censored. Covariates: BUILDING segment, positive account
    * balance.
    */
  private def coxGaps(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = orders(s, d).select(col("o_custkey").as("ck"),
      col("o_orderdate").as("dt"))
    val endD = o.agg(max(col("dt")).as("endd"))
    val w = Window.partitionBy(col("ck")).orderBy(col("dt"))
    o.withColumn("nxt", lead(col("dt"), 1).over(w))
      .crossJoin(broadcast(endD))
      .join(customer(s, d).select(col("c_custkey").as("ck"),
        (col("c_mktsegment") === "BUILDING").cast("double")
          .as("x_building"),
        (col("c_acctbal") > 0).cast("double").as("x_pos_bal")),
        Seq("ck"))
      .select(
        when(col("nxt").isNotNull, datediff(col("nxt"), col("dt")))
          .otherwise(datediff(col("endd"), col("dt")))
          .cast("long").as("t"),
        when(col("nxt").isNotNull, 1).otherwise(0).as("e"),
        col("x_building"), col("x_pos_bal"))
  }

  // ---- q161 (rows-only — Newton iteration on a transcendental
  //      partial likelihood has no SQL form; determinism is the
  //      contract: one distributed pass to the (time × covariate-
  //      cell) sufficient table, all iterations driver-side in
  //      sorted order): Cox proportional hazards on reorder gaps —
  //      hazard ratios for BUILDING segment and positive balance
  //      JOINTLY, where q152's log-rank can only test one split. ----
  val q161Cox: Q = (s, d) =>
    Survival.coxPh(coxGaps(s, d), "t", "e",
      Seq("x_building", "x_pos_bal"))

  // ---- q162 (rows-only — the recursion is a sequential float fold,
  //      driver-side over the date-cardinality series, the q151
  //      convention): Holt linear-trend smoothing of daily revenue
  //      with a 7-day forecast fan — the forecasting baseline above
  //      q133's seasonal-naive. ----
  val q162Holt: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    DailySeries.holt(daily).orderBy(col("day"))
  }

  // ---- q163: Cochran–Mantel–Haenszel — "are BUILDING-segment
  //      customers more likely to place URGENT orders, controlling
  //      for order year?" — the Simpson's-paradox-proof stratified
  //      association test (the log-rank algebra with years as
  //      strata), plus the MH common odds ratio. All four sums exact
  //      order-free ppm-floored integers; chi2/OR the shared double
  //      formulas. ----
  val q163Cmh: Q = (s, d) =>
    GroupTests.cmh(orderSegments(s, d)
        .select(col("yr"), (col("seg") === "BUILDING").as("x"),
          (col("prio") === "1-URGENT").as("y")),
      "yr", "x", "y")

  val q163Oracle: String =
    s"""WITH $orderSegmentsSql,
      |strata AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n,
      |        CAST(SUM(CASE WHEN seg = 'BUILDING' AND prio = '1-URGENT'
      |          THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |        CAST(SUM(CASE WHEN seg = 'BUILDING' AND prio <> '1-URGENT'
      |          THEN 1 ELSE 0 END) AS BIGINT) AS b,
      |        CAST(SUM(CASE WHEN seg <> 'BUILDING' AND prio = '1-URGENT'
      |          THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |        CAST(SUM(CASE WHEN seg <> 'BUILDING' AND prio <> '1-URGENT'
      |          THEN 1 ELSE 0 END) AS BIGINT) AS d
      |      FROM os GROUP BY 1),
      |terms AS (SELECT a,
      |        CAST(a + b AS HUGEINT) * (a + c) * 1000000 // n AS e_ppm,
      |        CASE WHEN n > 1 THEN
      |          CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d)
      |            * 1000000 // (CAST(n AS HUGEINT) * n * (n - 1))
      |        ELSE 0 END AS v_ppm,
      |        CAST(a AS HUGEINT) * d * 1000000 // n AS orn_ppm,
      |        CAST(b AS HUGEINT) * c * 1000000 // n AS ord_ppm
      |      FROM strata),
      |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |        CAST(SUM(a) AS BIGINT) AS o,
      |        CAST(SUM(e_ppm) AS BIGINT) AS e_ppm,
      |        CAST(SUM(v_ppm) AS BIGINT) AS v_ppm,
      |        CAST(SUM(orn_ppm) AS BIGINT) AS or_num_ppm,
      |        CAST(SUM(ord_ppm) AS BIGINT) AS or_den_ppm
      |      FROM terms)
      |SELECT k, o, e_ppm, v_ppm,
      |  CASE WHEN v_ppm > 0 THEN
      |    round(${GroupTests.cmhChi2FormulaSql}, 6) ELSE NULL END AS chi2,
      |  or_num_ppm, or_den_ppm,
      |  CASE WHEN or_den_ppm > 0 THEN
      |    round(CAST(or_num_ppm AS DOUBLE) / CAST(or_den_ppm AS DOUBLE), 6)
      |  ELSE NULL END AS or_mh
      |FROM agg""".stripMargin

  // ---- q164: Friedman test per region — "do the five market
  //      segments rank consistently by monthly revenue?": blocks =
  //      months, treatments = segments, blocking removes the common
  //      seasonal trend Kruskal–Wallis would dilute power with.
  //      Blocks missing a segment are filtered out EXPLICITLY (the
  //      operator refuses incomplete blocks — a missing treatment
  //      shifts every midrank); the statistic is fully exact
  //      integers, one double division. ----
  val q164Friedman: Q = (s, d) => {
    val monthly = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey"), col("c_mktsegment").as("seg")),
        Seq("o_custkey"))
      .join(nation(s, d).select(col("n_nationkey").as("c_nationkey"),
        col("n_regionkey").as("region")), Seq("c_nationkey"))
      .groupBy(col("region"), trunc(col("o_orderdate"), "month").as("mon"),
        col("seg"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    val k = monthly.select(col("seg")).distinct().count()
    val complete = monthly.groupBy(col("region"), col("mon"))
      .agg(count(lit(1)).as("c")).filter(col("c") === k)
      .select(col("region"), col("mon"))
    RankCorr.friedman(monthly.join(complete, Seq("region", "mon")),
        "region", "mon", "seg", "rev")
      .orderBy(col("region"))
  }

  /** The q164 Friedman CTE chain up to the exact (num, den)
    * aggregate — shared with q179's Kendall-W oracle (W is the same
    * algebra rescaled).
    */
  private[queries] val friedmanAggSql: String =
    """WITH monthly AS (SELECT n_regionkey AS region,
      |        date_trunc('month', o_orderdate) AS mon,
      |        c_mktsegment AS seg,
      |        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |          AS rev
      |      FROM orders JOIN customer ON c_custkey = o_custkey
      |      JOIN nation ON n_nationkey = c_nationkey
      |      GROUP BY 1, 2, 3),
      |kk AS (SELECT COUNT(DISTINCT seg) AS kglob FROM monthly),
      |complete AS (SELECT region, mon FROM monthly, kk
      |      GROUP BY region, mon, kglob HAVING COUNT(*) = kglob),
      |cells AS (SELECT m.* FROM monthly m JOIN complete USING (region, mon)),
      |m2 AS (SELECT region, mon, seg,
      |        2 * (RANK() OVER (PARTITION BY region, mon ORDER BY rev) - 1)
      |          + CAST(COUNT(*) OVER (PARTITION BY region, mon, rev)
      |            AS BIGINT) + 1 AS m2
      |      FROM cells),
      |kg AS (SELECT region, CAST(COUNT(DISTINCT seg) AS BIGINT) AS k
      |      FROM cells GROUP BY 1),
      |per AS (SELECT region, seg, CAST(SUM(m2) AS HUGEINT) AS r2,
      |        CAST(COUNT(*) AS BIGINT) AS n,
      |        SUM(CAST(m2 AS HUGEINT) * m2) AS m2sq
      |      FROM m2 GROUP BY 1, 2),
      |agg AS (SELECT region, k, MAX(n) AS n_blocks,
      |        (k - 1) * SUM((r2 - CAST(n AS HUGEINT) * (k + 1))
      |          * (r2 - CAST(n AS HUGEINT) * (k + 1))) AS num,
      |        SUM(m2sq) - MAX(n) * CAST(k AS HUGEINT) * (k + 1) * (k + 1)
      |          AS den
      |      FROM per JOIN kg USING (region) GROUP BY 1, 2)""".stripMargin

  val q164Oracle: String = friedmanAggSql +
    """
      |SELECT region, k, CAST(n_blocks AS BIGINT) AS n_blocks,
      |  CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
      |  CASE WHEN den > 0 THEN
      |    round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
      |  ELSE NULL END AS chi2
      |FROM agg ORDER BY region""".stripMargin

  // ---- q165: Jonckheere–Terpstra ordered trend per year — "does
  //      order value INCREASE along the priority tiers?": the
  //      ordered-alternative K-sample test (strictly more power than
  //      q155's KW when the alternative is the monotone tier trend).
  //      No cell² join: filled pooled axis + the shared cumulative-
  //      count machinery + a ≤K-row window per (year, value); S and
  //      all five tie sums exact, z the shared-text formula. ----
  val q165Jt: Q = (s, d) =>
    RankCorr.jonckheereTerpstra(
      orderSegments(s, d).select(col("yr"),
        substring(col("prio"), 1, 1).cast("long").as("tier"),
        col("dollars")),
      "yr", "tier", "dollars")
      .orderBy(col("yr"))

  val q165Oracle: String =
    s"""WITH $orderSegmentsSql,
      |cells AS (SELECT yr, CAST(substr(prio, 1, 1) AS BIGINT) AS smp,
      |        dollars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      |      FROM os GROUP BY 1, 2, 3),
      |axis AS (SELECT DISTINCT yr, v FROM cells),
      |smps AS (SELECT DISTINCT yr, smp FROM cells),
      |filled AS (SELECT axis.yr, smps.smp, axis.v,
      |        COALESCE(cnt, 0) AS cnt
      |      FROM axis JOIN smps ON axis.yr = smps.yr
      |      LEFT JOIN cells ON cells.yr = axis.yr
      |        AND cells.smp = smps.smp AND cells.v = axis.v),
      |nsmp AS (SELECT yr, smp, CAST(SUM(cnt) AS BIGINT) AS n_i
      |      FROM cells GROUP BY 1, 2),
      |ab AS (SELECT f.yr, f.smp, f.v, f.cnt,
      |        SUM(f.cnt) OVER (PARTITION BY f.yr, f.smp ORDER BY f.v
      |          ROWS UNBOUNDED PRECEDING) - f.cnt AS below,
      |        n_i FROM filled f JOIN nsmp USING (yr, smp)),
      |ab2 AS (SELECT yr, smp, v, cnt, below,
      |        n_i - below - cnt AS above FROM ab),
      |low AS (SELECT yr, v, cnt,
      |        SUM(below - above) OVER (PARTITION BY yr, v ORDER BY smp
      |          ROWS UNBOUNDED PRECEDING) - (below - above) AS lowdiff
      |      FROM ab2),
      |sagg AS (SELECT yr,
      |        2 * SUM(CAST(cnt AS HUGEINT) * lowdiff) AS s FROM low
      |      GROUP BY 1),
      |tm AS (SELECT yr, CAST(SUM(t) AS BIGINT) AS n,
      |        CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS BIGINT) AS t2,
      |        CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
      |          AS BIGINT) AS t25,
      |        CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (t - 2))
      |          AS BIGINT) AS t3
      |      FROM (SELECT yr, v, SUM(cnt) AS t FROM cells GROUP BY 1, 2)
      |      GROUP BY 1),
      |um AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS k,
      |        CAST(SUM(CAST(n_i AS HUGEINT) * (n_i - 1)) AS BIGINT) AS u2,
      |        CAST(SUM(CAST(n_i AS HUGEINT) * (n_i - 1) * (2 * n_i + 5))
      |          AS BIGINT) AS u25,
      |        CAST(SUM(CAST(n_i AS HUGEINT) * (n_i - 1) * (n_i - 2))
      |          AS BIGINT) AS u3
      |      FROM nsmp GROUP BY 1)
      |SELECT yr, k, n, CAST(s AS BIGINT) AS s,
      |  CASE WHEN n >= 3 AND ${RankCorr.jtVarFormulaSql} > 0 THEN
      |    round(CAST(s AS DOUBLE) / (2.0 * sqrt(${RankCorr.jtVarFormulaSql})), 6)
      |  ELSE NULL END AS z
      |FROM sagg JOIN tm USING (yr) JOIN um USING (yr)
      |ORDER BY yr""".stripMargin

  // ---- graph_harmonic (rows-only — iterate-to-fixpoint BFS, the
  //      graph_bfs convention; exact integer ⌊10⁶/d⌋ sums make
  //      rows-only a determinism statement): harmonic centrality of
  //      the brand co-purchase graph — "which brands sit closest to
  //      ALL other brands?", the disconnection-safe centrality
  //      (Boldi–Vigna 2014). Brand-cardinality nodes: the exact
  //      all-pairs form's home turf. ----
  val graphHarmonic: Q = (s, d) => {
    val li = lineitem(s, d)
      .join(part(s, d).select(col("p_partkey").as("l_partkey"),
        substring(col("p_brand"), 7, 2).cast("long").as("brand")),
        Seq("l_partkey"))
      .select(col("l_orderkey").as("ok"), col("brand")).distinct()
    // AFFINITY edges: pairs co-bought strictly more than the mean
    // pair (an exact integer threshold, scale-free — an absolute
    // count would saturate to the complete graph as the corpus grows).
    // r18: the mean rides the pair table's checkpoint as Observation
    // metrics — the old scalar-aggregate crossJoin(broadcast(thresh))
    // planted the whole self-join subtree TWICE in one plan (profiled:
    // two identical 8-task 0.45 s stages), and ReuseExchange did not
    // collapse them. Same integers: sum DIV count on the driver is the
    // same floor division of the same exact longs.
    val pairObs = org.apache.spark.sql.Observation()
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("x"), col("b.brand").as("y"))
      .agg(count(lit(1)).as("n"))
      .observe(pairObs, sum(col("n")).as("__s"), count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val mean = {
      val c = pairObs.get("__c").asInstanceOf[Long]
      // counts are >= 1, so truncating DIV == floorDiv; sum is null
      // only when the pair table is empty (c == 0)
      if (c == 0) 0L
      else java.lang.Math.floorDiv(pairObs.get("__s").asInstanceOf[Long], c)
    }
    val edges = pairs.filter(col("n") > lit(mean)).select(col("x"), col("y"))
    GraphOps.harmonicCentrality(edges, "x", "y")
  }

  // ---- q166: day-of-week seasonal profile of daily revenue — the
  //      classical-decomposition seasonal summary ("how much does a
  //      Monday differ from trend?"). Detrended mass d7 = 7·rev −
  //      Σ±3days rev stays an exact integer (scaled by 7, no per-day
  //      division); full windows only; weekday by the explicit
  //      epoch-anchored formula (engines disagree on dayofweek
  //      numbering); ONE double division per weekday. ----
  val q166WeekdaySeasonal: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    DailySeries.weekdayProfile(daily)
  }

  val q166Oracle: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
      |          AS BIGINT) AS rev
      |      FROM orders GROUP BY 1),
      |win AS (SELECT a.day, a.rev, COUNT(*) AS tdays,
      |        CAST(SUM(b.rev) AS BIGINT) AS tsum
      |      FROM daily a JOIN daily b
      |        ON b.day BETWEEN a.day - 3 AND a.day + 3
      |      GROUP BY 1, 2),
      |d7 AS (SELECT CAST((day - DATE '1970-01-05') % 7 AS BIGINT) AS dow,
      |        rev * 7 - tsum AS d7
      |      FROM win WHERE tdays = 7)
      |SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(SUM(d7) AS BIGINT) AS sum_d7,
      |  round(CAST(SUM(d7) AS DOUBLE) / (700.0 * COUNT(*)), 4)
      |    AS seasonal_dollars
      |FROM d7 GROUP BY 1 ORDER BY dow""".stripMargin

  // ---- q167: Benford first-digit conformance of order amounts —
  //      the audit/fraud/data-quality screen. TPC-H prices are
  //      synthetic-uniform, so the screen FIRES (a huge chi2) —
  //      exactly what it should say about synthetic data; the
  //      oracle checks the machinery end-to-end on the same exact
  //      integers. ----
  val q167Benford: Q = (s, d) =>
    graft.operators.Benford.test(
      orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents")),
      "cents")

  val q167Oracle: String =
    """WITH p(digit, p_ppm) AS (VALUES (1, 301030), (2, 176091),
      |    (3, 124939), (4, 96910), (5, 79181), (6, 66947), (7, 57992),
      |    (8, 51153), (9, 45757)),
      |obs AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
      |          AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
      |        CAST(COUNT(*) AS BIGINT) AS o
      |      FROM orders WHERE round(o_totalprice * 100) > 0 GROUP BY 1),
      |filled AS (SELECT p.digit, p.p_ppm, COALESCE(o, 0) AS o
      |      FROM p LEFT JOIN obs ON p.digit = obs.digit),
      |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM filled),
      |terms AS (SELECT digit, CAST(o AS BIGINT) AS observed, n,
      |        CAST(CAST(n AS HUGEINT) * p_ppm AS BIGINT) AS expected_ppm,
      |        CAST((CAST(o AS HUGEINT) * 1000000 - CAST(n AS HUGEINT) * p_ppm)
      |          * (CAST(o AS HUGEINT) * 1000000 - CAST(n AS HUGEINT) * p_ppm)
      |          * 1000000 // (CAST(n AS HUGEINT) * p_ppm * 1000000)
      |          AS BIGINT) AS term_ppm
      |      FROM filled, nn),
      |tot AS (SELECT CAST(SUM(term_ppm) AS BIGINT) AS chi2_ppm FROM terms)
      |SELECT digit, observed, n, expected_ppm, term_ppm, chi2_ppm,
      |  round(CAST(chi2_ppm AS DOUBLE) / 1000000.0, 6) AS chi2
      |FROM terms, tot ORDER BY digit""".stripMargin

  // ---- q168: Nelson–Aalen cumulative reorder hazard per market
  //      segment — the hazard-scale companion of q151's KM curve
  //      (exp(−Ĥ) ≈ Ŝ; increments are what rate models consume).
  //      Unlike KM's sequential product this is FULLY DISTRIBUTED
  //      exact: ⌊d·10⁶/n⌋ increments cumulated by the shared prefix
  //      machinery — no driver fold, no collect cap. ----
  val q168NelsonAalen: Q = (s, d) =>
    Survival.nelsonAalen(Advanced6.reorderGaps(s, d), "seg", "t", "e")

  val q168Oracle: String =
    s"""WITH ${Advanced6.gapsSql},
      |counts AS (SELECT seg, t, CAST(SUM(e) AS BIGINT) AS d,
      |        CAST(COUNT(*) AS BIGINT) AS cnt FROM obs GROUP BY 1, 2),
      |ng AS (SELECT seg, SUM(cnt) AS n_g FROM counts GROUP BY 1),
      |below AS (SELECT seg, t, d,
      |        SUM(cnt) OVER (PARTITION BY seg ORDER BY t
      |          ROWS UNBOUNDED PRECEDING) - cnt AS below
      |      FROM counts),
      |steps AS (SELECT seg, t, CAST(n_g - below AS BIGINT) AS n_risk, d,
      |        CAST(CAST(d AS HUGEINT) * 1000000
      |          // CAST(n_g - below AS HUGEINT) AS BIGINT) AS h_ppm
      |      FROM below JOIN ng USING (seg) WHERE d > 0)
      |SELECT seg, t, n_risk, d, h_ppm,
      |  CAST(SUM(h_ppm) OVER (PARTITION BY seg ORDER BY t
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumhaz_ppm,
      |  round(CAST(SUM(h_ppm) OVER (PARTITION BY seg ORDER BY t
      |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1000000.0, 6) AS cumhaz
      |FROM steps ORDER BY seg, t""".stripMargin

  val queries: Map[String, Q] = Map(
    "q155_kruskal_wallis" -> q155KruskalWallis,
    "q156_anova" -> q156Anova,
    "q157_mood_median" -> q157MoodMedian,
    "q158_cramers_v" -> q158CramersV,
    "q159_hhi" -> q159Hhi,
    "q160_bh_fdr" -> q160BhFdr,
    "q161_cox" -> q161Cox,
    "q162_holt" -> q162Holt,
    "q163_cmh" -> q163Cmh,
    "q164_friedman" -> q164Friedman,
    "q165_jonckheere" -> q165Jt,
    "q166_weekday_seasonal" -> q166WeekdaySeasonal,
    "q167_benford" -> q167Benford,
    "q168_nelson_aalen" -> q168NelsonAalen,
    "graph_harmonic" -> graphHarmonic)

  val oracles: Map[String, String] = Map(
    "q155_kruskal_wallis" -> q155Oracle,
    "q156_anova" -> q156Oracle,
    "q157_mood_median" -> q157Oracle,
    "q158_cramers_v" -> q158Oracle,
    "q159_hhi" -> q159Oracle,
    "q160_bh_fdr" -> q160Oracle,
    "q163_cmh" -> q163Oracle,
    "q164_friedman" -> q164Oracle,
    "q165_jonckheere" -> q165Oracle,
    "q166_weekday_seasonal" -> q166Oracle,
    "q167_benford" -> q167Oracle,
    "q168_nelson_aalen" -> q168Oracle)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-SAMPLE GROUP-COMPARISON TESTS on exact sufficient statistics —
  * one-way ANOVA (Fisher 1925), Mood's median test (Mood 1950), and
  * the chi-square / Cramér's V contingency pair (Cramér 1946):
  * "do these K populations differ?", each answered from a different
  * robustness stance (moments / median counts / pure categories),
  * next to the rank-based [[RankCorr.kruskalWallis]].
  *
  * EXACTNESS SHAPE (the q152/q155 ppm discipline): every sum is an
  * exact integer or DECIMAL(38,0) sufficient statistic — per-sample
  * (n_j, Σv, Σv²) moment tuples, per-cell contingency counts, count
  * tables for the pooled median — and every intermediate RATIONAL
  * (S_j²/n_j, (o·n − r·c)²/(n·r·c)) enters as ONE exact integral
  * floor division (Spark DIV == DuckDB HUGEINT //), so the cross-
  * sample sums are order-free exact integers; the final statistic is
  * the ONE double formula shared VERBATIM with the oracle (the
  * `*FormulaSql` constants below are `expr()`ed on the Spark side
  * and textually embedded in the DuckDB oracle — identical parse,
  * identical IEEE evaluation order).
  */
object GroupTests {

  /** Kruskal–Wallis H with tie correction, from exact integer inputs
    * (rsq_sum = Σ_j ⌊(2R_j)²/n_j⌋, t3t = Σ(t³−t), n): H =
    * [12/(n(n+1))]·ΣR_j²/n_j − 3(n+1), divided by 1 − t3t/(n³−n).
    * Shared verbatim between [[RankCorr.kruskalWallis]] and its
    * oracle. (2R)²/4 folds the 12 → 3.)
    */
  val kwHFormulaSql: String =
    "(3.0 * CAST(rsq_sum AS DOUBLE) / (CAST(n AS DOUBLE) * (n + 1)) " +
      "- 3.0 * (n + 1)) / " +
      "(1.0 - CAST(t3t AS DOUBLE) / " +
      "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - n))"

  /** One-way ANOVA F from exact integer sums of squares:
    * F = (ssb/(k−1)) / (ssw/(n−k)). Shared verbatim with the oracle.
    */
  val anovaFFormulaSql: String =
    "(CAST(ssb AS DOUBLE) / (k - 1)) / (CAST(ssw AS DOUBLE) / (n - k))"

  /** CMH chi-square from the exact integer (o, e_ppm, v_ppm) sums —
    * (O − E)²/V with the square written as an explicit product (both
    * engines multiply; a pow() could round differently). Shared
    * verbatim with the oracle.
    */
  val cmhChi2FormulaSql: String =
    "(CAST(o AS DOUBLE) - CAST(e_ppm AS DOUBLE) / 1000000.0) * " +
      "(CAST(o AS DOUBLE) - CAST(e_ppm AS DOUBLE) / 1000000.0) / " +
      "(CAST(v_ppm AS DOUBLE) / 1000000.0)"

  /** Per-FAMILY one-way ANOVA — the parametric K-sample location
    * test: decompose the family's total sum of squares into between-
    * sample and within-sample parts, F = MSB/MSW with (k−1, n−k)
    * degrees of freedom, effect size η² = SSB/SST.
    *
    * EXACT: per-sample moment tuples (n_j, S_j = Σv, Q_j = Σv²) are
    * exact integers; SSB = Σ_j ⌊S_j²/n_j⌋ − ⌊S²/n⌋ and
    * SSW = Q − Σ_j ⌊S_j²/n_j⌋ floor each rational at unit scale
    * (identically in both engines), so both are order-free exact
    * integers; F and η² are the two double formulas rounded to 6.
    *
    * Magnitude contract ENFORCED in-plan: the family bound
    * (n·max|v|)² < 9·10³⁷ covers every decimal intermediate (moments,
    * per-sample and family squares) — keep `valueCol` in units where
    * n·max|v| < ~10¹⁸ (the q156 contract query uses whole DOLLARS).
    * A DECIMAL overflow nulls the TERM, and SUM would silently SKIP
    * the null — so a bound violation REFUSES loudly via in-plan
    * raise_error (the cmh/mood convention), with no separate
    * pre-scan action.
    *
    * @return (famCol, k, n, ssb, ssw, f, eta2) — f null for k < 2 or
    *         zero within-variance, eta2 null for zero total variance
    */
  def anovaOneWay(df: DataFrame, famCol: String, sampleCol: String,
                  valueCol: String): DataFrame =
    anovaFromCells(
      df.select(col(famCol).as("g"), col(sampleCol).as("smp"),
          col(valueCol).cast("long").as("v"))
        .groupBy(col("g"), col("smp"), col("v"))
        .agg(count(lit(1)).as("cnt")),
      famCol)

  /** [[anovaOneWay]] from a pre-aggregated (g, smp, v, cnt) count
    * table — the streaming-state form: per-sample moments are sums
    * over the cells (n_j = Σcnt, S_j = Σcnt·v, Q_j = Σcnt·v²).
    */
  private[graft] def anovaFromCells(cellsIn: DataFrame,
                                    famCol: String): DataFrame = {
    def dcm(c: Column): Column = c.cast("decimal(38,0)")
    // magnitude guard rides the SAME job as the moments (r16 — the
    // separate pre-scan cost a localCheckpoint plus its own count()
    // action, the fixed floor the r15 verdict flagged): the
    // per-family bound b = n·max|v| must satisfy b² < 9·10³⁷, which
    // covers EVERY decimal intermediate — q ≤ n·max² ≤ b², per-sample
    // s_j² ≤ (n_j·max)² ≤ b², the family-level s² ≤ b², bsum ≤ n·max²
    // (the old per-sample n_j·max(v²) bound UNDER-covered the squares
    // s_j² and s², which are up to n× larger — the r15 sweep item).
    // The bound rides doubles (can't overflow), and it gates through
    // a BROADCAST build side: the broadcast materializes BEFORE any
    // probe-side task runs, so a violating family raises the NAMED
    // refusal before the decimal algebra can overflow (ANSI) or
    // NULL-poison a sum (non-ANSI). The bound aggregate's exchange is
    // shared with the moment pass — no extra action, no extra scan.
    val gate = broadcast(cellsIn.groupBy(col("g"))
      .agg((sum(col("cnt")).cast("double") *
        max(greatest(abs(col("v")), lit(1L)).cast("double"))).as("b"))
      .select(col("g"),
        when(col("b") * col("b") < lit(9.0e37), lit(1))
          .otherwise(raise_error(lit(
            "anovaOneWay: a family's moment bound (n*max|v|)^2 " +
              "reaches the DECIMAL(38,0) range — rescale valueCol " +
              "to coarser units")).cast("int")).as("__gate")))
    // n_j multiplies by __gate (always 1 for admissible rows) so the
    // guard column stays REFERENCED — column pruning would otherwise
    // strip the raise_error projection out of the broadcast build
    // side entirely (observed: the pruned gate became a bare distinct
    // join and never fired)
    val perSample = cellsIn.join(gate, Seq("g"))
      .groupBy(col("g"), col("smp"))
      .agg(sum(col("cnt") * col("__gate")).cast("long").as("n_j"),
        sum(dcm(col("cnt")) * dcm(col("v"))).cast("decimal(38,0)").as("s_j"),
        sum(dcm(col("cnt")) * dcm(col("v")) * dcm(col("v")))
          .cast("decimal(38,0)").as("q_j"))
    val agg = perSample
      .select(col("g"), col("n_j"), col("s_j"), col("q_j"),
        expr("CAST(s_j * s_j AS DECIMAL(38,0)) DIV n_j").as("bterm"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("bigint").as("k"),
        sum(col("n_j")).cast("bigint").as("n"),
        sum(col("s_j")).cast("decimal(38,0)").as("s"),
        sum(col("q_j")).cast("decimal(38,0)").as("q"),
        sum(col("bterm")).cast("decimal(38,0)").as("bsum"))
    agg
      .withColumn("ssb",
        (col("bsum") - expr("CAST(s * s AS DECIMAL(38,0)) DIV n"))
          .cast("bigint"))
      .withColumn("ssw", (col("q") - col("bsum")).cast("bigint"))
      .select(col("g").as(famCol), col("k"), col("n"),
        col("ssb"), col("ssw"),
        when(col("k") > 1 && col("n") > col("k") && col("ssw") > 0,
          round(expr(anovaFFormulaSql), 6))
          .otherwise(lit(null).cast("double")).as("f"),
        when(col("ssb") + col("ssw") > 0,
          round(col("ssb").cast("double") /
            (col("ssb") + col("ssw")).cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("eta2"))
  }

  /** TWO-WAY ANOVA F's from the exact integer sums of squares and
    * level counts — shared verbatim with the oracle.
    */
  val anova2FaSql: String =
    "(CAST(ssa AS DOUBLE) / (a_lvls - 1)) / " +
      "(CAST(ssw AS DOUBLE) / (n - n_cells))"
  val anova2FbSql: String =
    "(CAST(ssb AS DOUBLE) / (b_lvls - 1)) / " +
      "(CAST(ssw AS DOUBLE) / (n - n_cells))"
  val anova2FabSql: String =
    "(CAST(ssab AS DOUBLE) / (n_cells - a_lvls - b_lvls + 1)) / " +
      "(CAST(ssw AS DOUBLE) / (n - n_cells))"

  /** Per-FAMILY TWO-WAY ANOVA with interaction (fixed two-factor
    * crossed design — Fisher 1925 §42ff) — the apex of the K-sample
    * battery: decompose the total sum of squares into factor-A,
    * factor-B, interaction, and within-cell parts,
    *
    *   SS_W  = Q − T_cells          (within cells — pure error)
    *   SS_A  = T_A − T_0            (A marginal)
    *   SS_B  = T_B − T_0            (B marginal)
    *   SS_AB = T_cells − T_A − T_B + T_0   (interaction remainder)
    *
    * with T_X = Σ_x ⌊S_x²/n_x⌋ over the cells/marginals/total — the
    * classical textbook decomposition (exact for balanced designs;
    * for unbalanced cell counts it is the standard unadjusted
    * sequential form, stated — each SS is still a well-defined exact
    * integer both engines compute identically).
    *
    * EXACT (the [[anovaOneWay]] discipline): per-cell moment tuples
    * (n_c, S_c = Σv, Q_c = Σv²) are exact integers off ONE row-scale
    * pass; every rational S²/n enters as ONE exact integral floor
    * division at unit scale (Spark DIV == DuckDB HUGEINT // on the
    * non-negative squares), so all four SS are order-free exact
    * integers; the three F's are shared-text double formulas rounded
    * 6. Floors can make a true-zero SS marginally NEGATIVE (each
    * floored term loses < 1 against the unfloored identity) — the
    * F for a negative SS is null (a zero effect, stated).
    *
    * Magnitude contract: the [[anovaFromCells]] bound
    * (n·max|v|)² < 9·10³⁷, refused IN-PLAN through a broadcast gate
    * multiplied into n_c (pruning-proof from day one — the r17
    * sweep convention).
    *
    * Scale shape: one row-scale aggregate to the (family, a, b)
    * cell-moment table (bounded cardinality), then everything is
    * cell-sized: two marginal re-aggregations + two broadcast joins.
    *
    * @return (famCol, a_lvls, b_lvls, n_cells, n, ssa, ssb, ssab,
    *         ssw, f_a, f_b, f_ab) — f_a null for a_lvls < 2, no
    *         error dof (n ≤ n_cells), zero/negative SS_W or negative
    *         SS_A (twins for f_b); f_ab additionally null for an
    *         interaction dof < 1 (an incomplete crossing) or
    *         negative SS_AB
    */
  def anovaTwoWay(df: DataFrame, famCol: String, aCol: String,
                  bCol: String, valueCol: String): DataFrame =
    anova2FromCells(
      df.select(col(famCol).as("g"), col(aCol).as("fa"),
          col(bCol).as("fb"), col(valueCol).cast("long").as("v"))
        .groupBy(col("g"), col("fa"), col("fb"), col("v"))
        .agg(count(lit(1)).as("cnt")),
      famCol)

  /** [[anovaTwoWay]] from a pre-aggregated (g, fa, fb, v, cnt) count
    * table — the streaming-state form: the per-(family, A, B, value)
    * count table is the additive sufficient statistic.
    */
  private[graft] def anova2FromCells(cellsIn: DataFrame,
                                     famCol: String): DataFrame = {
    def dcm(c: Column): Column = c.cast("decimal(38,0)")
    // the anovaFromCells magnitude gate, verbatim: b = n·max|v| with
    // b² < 9·10³⁷ covers every decimal intermediate (q ≤ n·max² ≤ b²,
    // per-cell/marginal/total squares ≤ b²); broadcast build side,
    // multiplied into n_c so pruning keeps the refusal
    val gate = broadcast(cellsIn.groupBy(col("g"))
      .agg((sum(col("cnt")).cast("double") *
        max(greatest(abs(col("v")), lit(1L)).cast("double"))).as("b"))
      .select(col("g"),
        when(col("b") * col("b") < lit(9.0e37), lit(1L))
          .otherwise(raise_error(lit(
            "anovaTwoWay: a family's moment bound (n*max|v|)^2 " +
              "reaches the DECIMAL(38,0) range — rescale valueCol " +
              "to coarser units")).cast("bigint")).as("__gate")))
    val perCell = cellsIn.join(gate, Seq("g"))
      .groupBy(col("g"), col("fa"), col("fb"))
      .agg(sum(col("cnt") * col("__gate")).cast("long").as("n_c"),
        sum(dcm(col("cnt")) * dcm(col("v"))).cast("decimal(38,0)").as("s_c"),
        sum(dcm(col("cnt")) * dcm(col("v")) * dcm(col("v")))
          .cast("decimal(38,0)").as("q_c"))
      .localCheckpoint(true) // cell table feeds total + two marginals
    val tc = perCell
      .select(col("g"), col("n_c"), col("s_c"), col("q_c"),
        expr("CAST(s_c * s_c AS DECIMAL(38,0)) DIV n_c").as("cterm"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("bigint").as("n_cells"),
        sum(col("n_c")).cast("bigint").as("n"),
        sum(col("s_c")).cast("decimal(38,0)").as("s"),
        sum(col("q_c")).cast("decimal(38,0)").as("q"),
        sum(col("cterm")).cast("decimal(38,0)").as("t_cells"))
    def marg(f: String, lvls: String, t: String): DataFrame = perCell
      .groupBy(col("g"), col(f))
      .agg(sum(col("n_c")).cast("long").as("n_m"),
        sum(col("s_c")).cast("decimal(38,0)").as("s_m"))
      .select(col("g"), col("n_m"), col("s_m"),
        expr("CAST(s_m * s_m AS DECIMAL(38,0)) DIV n_m").as("mterm"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("bigint").as(lvls),
        sum(col("mterm")).cast("decimal(38,0)").as(t))
    tc.join(broadcast(marg("fa", "a_lvls", "t_a")), Seq("g"))
      .join(broadcast(marg("fb", "b_lvls", "t_b")), Seq("g"))
      .withColumn("t0", expr("CAST(s * s AS DECIMAL(38,0)) DIV n"))
      .select(col("g").as(famCol), col("a_lvls"), col("b_lvls"),
        col("n_cells"), col("n"),
        (col("t_a") - col("t0")).cast("bigint").as("ssa"),
        (col("t_b") - col("t0")).cast("bigint").as("ssb"),
        (col("t_cells") - col("t_a") - col("t_b") + col("t0"))
          .cast("bigint").as("ssab"),
        (col("q") - col("t_cells")).cast("bigint").as("ssw"))
      .withColumn("f_a",
        when(col("a_lvls") > 1 && col("n") > col("n_cells") &&
          col("ssw") > 0 && col("ssa") >= 0,
          round(expr(anova2FaSql), 6))
          .otherwise(lit(null).cast("double")))
      .withColumn("f_b",
        when(col("b_lvls") > 1 && col("n") > col("n_cells") &&
          col("ssw") > 0 && col("ssb") >= 0,
          round(expr(anova2FbSql), 6))
          .otherwise(lit(null).cast("double")))
      .withColumn("f_ab",
        when(col("n_cells") - col("a_lvls") - col("b_lvls") + 1 >= 1 &&
          col("n") > col("n_cells") && col("ssw") > 0 &&
          col("ssab") >= 0,
          round(expr(anova2FabSql), 6))
          .otherwise(lit(null).cast("double")))
  }

  /** Per-FAMILY MOOD'S MEDIAN TEST — the coarsest, most outlier-
    * immune K-sample location test: dichotomize every observation at
    * the family's pooled (lower) median and chi-square the resulting
    * 2×K table. Where Kruskal–Wallis uses full rank information,
    * Mood's test survives ANY monotone contamination of the tails.
    *
    * EXACT: the pooled nearest-rank lower median (position
    * ⌊(n+1)/2⌋) is SELECTED from the family's value-cardinality
    * count table ([[RankCorr.cumFromCounts]]); the 2×K observed/
    * expected cells are exact integer marginal products, each cell's
    * chi-square contribution enters as the exact ppm floor
    * ⌊(o·n − r·c)²·10⁶ / (n·r·c)⌋, so chi2_ppm is an order-free
    * exact integer; the statistic is its one descaling, rounded 6.
    *
    * @return (famCol, k, n, median, chi2_ppm, chi2) — null chi2 when
    *         a margin is empty (every value on one side of the
    *         median: the test is undefined)
    */
  def moodMedianTest(df: DataFrame, famCol: String, sampleCol: String,
                     valueCol: String): DataFrame =
    moodFromCells(
      df.select(col(famCol).as("g"), col(sampleCol).as("smp"),
          col(valueCol).cast("long").as("v"))
        .groupBy(col("g"), col("smp"), col("v"))
        .agg(count(lit(1)).as("cnt")),
      famCol)

  /** [[moodMedianTest]] from a pre-aggregated (g, smp, v, cnt) count
    * table — the streaming-state form.
    */
  private[graft] def moodFromCells(cellsIn: DataFrame,
                                   famCol: String): DataFrame = {
    val cells = cellsIn
      .localCheckpoint(true) // pooled median pass + per-sample splits
    val pooled = cells.groupBy(col("g"), col("v"))
      .agg(sum(col("cnt")).as("cnt"))
    val cum = RankCorr.cumFromCounts(pooled, "v")
    val n = pooled.groupBy(col("g"))
      .agg(sum(col("cnt")).cast("bigint").as("n"))
    // the cmh/logRank magnitude refusal, IN-PLAN (r16 — previously a
    // localCheckpoint + its own count() action): each cell's
    // chi-square numerator (o·n − r·c)²·10⁶ is bounded by (n²/4)²·10⁶,
    // which reaches 10³⁸ (past DECIMAL(38,0) max) at n = 2e8 — and an
    // overflowed term goes NULL, which SUM silently SKIPS, yielding a
    // wrong non-null chi2_ppm. The median position is computed for
    // EVERY family when the broadcast side materializes, so a too-big
    // family raises there, before any chi-square term can be read.
    val med = cum.join(broadcast(
        n.select(col("g"),
          when(col("n") <= 190000000L, expr("(n + 1) DIV 2"))
            .otherwise(raise_error(lit(
              "moodMedianTest: a family exceeds 1.9e8 observations — " +
                "the exact ppm chi-square algebra needs " +
                "(n^2/4)^2*10^6 < 10^38; sample first")).cast("bigint"))
            .as("__pos"))), Seq("g"))
      .filter(col("below") < col("__pos") &&
        col("__pos") <= col("below") + col("cnt"))
      .select(col("g"), col("v").as("med"))
    val perSample = cells.join(broadcast(med), Seq("g"))
      .groupBy(col("g"), col("smp"))
      .agg(sum(when(col("v") > col("med"), col("cnt")).otherwise(0L))
          .cast("bigint").as("above"),
        sum(col("cnt")).cast("bigint").as("n_j"))
    val marg = perSample.groupBy(col("g"))
      .agg(sum(col("above")).cast("bigint").as("r_above"),
        sum(col("n_j")).cast("bigint").as("n"),
        count(lit(1)).cast("bigint").as("k"))
    def dcm(c: Column): Column = c.cast("decimal(38,0)")
    // both cells of each sample's column: (above, r_above) and
    // (n_j − above, n − r_above); (o·n − r·c) is identical up to sign
    // across the two cells of a column, so each contributes the same
    // numerator over its own denominator
    val contrib = perSample.join(broadcast(marg), Seq("g"))
      .select(col("g"), col("k"), col("n"), col("r_above"),
        ((dcm(col("above")) * dcm(col("n"))
          - dcm(col("r_above")) * dcm(col("n_j")))
          * (dcm(col("above")) * dcm(col("n"))
            - dcm(col("r_above")) * dcm(col("n_j"))))
          .cast("decimal(38,0)").as("num2"),
        (dcm(col("n")) * dcm(col("r_above")) * dcm(col("n_j")))
          .cast("decimal(38,0)").as("den_above"),
        (dcm(col("n")) * (dcm(col("n")) - dcm(col("r_above")))
          * dcm(col("n_j"))).cast("decimal(38,0)").as("den_below"))
    val chi = contrib.groupBy(col("g"), col("k"), col("n"), col("r_above"))
      .agg((sum(when(col("r_above") > 0,
          expr("CAST(num2 * 1000000 AS DECIMAL(38,0)) DIV den_above"))
          .otherwise(lit(null))) +
        sum(when(col("n") > col("r_above"),
          expr("CAST(num2 * 1000000 AS DECIMAL(38,0)) DIV den_below"))
          .otherwise(lit(null)))).cast("bigint").as("chi2_ppm"))
    chi.join(broadcast(med), Seq("g"))
      .select(col("g").as(famCol), col("k"), col("n"),
        col("med").as("median"), col("chi2_ppm"),
        round(col("chi2_ppm").cast("double") / lit(1000000.0), 6)
          .as("chi2"))
  }

  /** COCHRAN–MANTEL–HAENSZEL test + Mantel–Haenszel common odds
    * ratio (Mantel & Haenszel 1959) — "is exposure associated with
    * outcome AFTER controlling for the stratifying confounder?":
    * the stratified-2×2 workhorse of epidemiology/observational
    * analysis, the categorical sibling of [[Survival.logRank]] (the
    * same O − E / hypergeometric-variance algebra, strata in place
    * of event times — a Simpson's-paradox-proof association test).
    *
    * FULLY DISTRIBUTED exact algebra (the q152 ppm discipline): per
    * stratum, E = n1·m1·10⁶ DIV n and V = n1·n0·m1·m0·10⁶ DIV
    * (n²(n−1)) are single exact integral divisions floored at ppm,
    * and the MH odds-ratio components a·d·10⁶ DIV n / b·c·10⁶ DIV n
    * likewise — all four sums are order-free exact integers; the
    * chi-square (no continuity correction — determinism over
    * small-sample nicety, stated) and OR are the two final double
    * formulas rounded 6. n⁴·10⁶ ≤ 10³⁸ REFUSAL above 2·10⁸ rows in
    * any one stratum.
    *
    * @param exposureCol boolean-valued; @param outcomeCol boolean
    * @return one row: (k, o, e_ppm, v_ppm, chi2, or_num_ppm,
    *         or_den_ppm, or_mh) — chi2 null on zero variance, or_mh
    *         null on a zero denominator
    */
  def cmh(df: DataFrame, strataCol: String, exposureCol: String,
          outcomeCol: String): DataFrame =
    cmhFromStrata(
      df.select(col(strataCol).as("g"),
          col(exposureCol).cast("boolean").as("x"),
          col(outcomeCol).cast("boolean").as("y"))
        .groupBy(col("g"))
        .agg(sum(when(col("x") && col("y"), 1L).otherwise(0L)).as("a"),
          sum(when(col("x") && !col("y"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("x") && col("y"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("x") && !col("y"), 1L).otherwise(0L)).as("d")))

  /** [[cmh]] from a pre-aggregated per-stratum (g, a, b, c, d) 2×2
    * table — the streaming-state form
    * ([[graft.streaming.StreamCmh]]): the four cell counts per
    * stratum are the additive sufficient statistic.
    */
  private[graft] def cmhFromStrata(strataIn: DataFrame): DataFrame = {
    // strictly below 2e8: with balanced margins the v_ppm numerator
    // (n/2)⁴·10⁶ reaches exactly 10³⁸ AT n = 2e8, which already
    // exceeds DECIMAL(38,0) max (10³⁸−1) — an at-the-cap stratum
    // would overflow to NULL and SUM would silently drop it. The
    // refusal is IN-PLAN (r16 — previously a localCheckpoint + its
    // own count() action): CASE evaluates the guard BEFORE the
    // decimal algebra, so a too-big stratum raises before its terms
    // exist.
    val guard = "CASE WHEN n > 190000000 THEN CAST(raise_error(" +
      "'cmh: a stratum exceeds 1.9e8 rows — the exact " +
      "single-division ppm algebra needs (n/2)^4*10^6 < 10^38; " +
      "sample first') AS DECIMAL(38,0)) ELSE %s END"
    val strata = strataIn
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
    val terms = strata.selectExpr(
      "a",
      guard.format("CAST(a + b AS DECIMAL(38,0)) * (a + c) * 1000000 " +
        "DIV CAST(n AS DECIMAL(38,0))") + " AS e_ppm",
      guard.format("CASE WHEN n > 1 THEN " +
        "CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d) " +
        "* 1000000 DIV (CAST(n AS DECIMAL(38,0)) * n * (n - 1)) " +
        "ELSE 0 END") + " AS v_ppm",
      guard.format("CAST(a AS DECIMAL(38,0)) * d * 1000000 " +
        "DIV CAST(n AS DECIMAL(38,0))") + " AS orn_ppm",
      guard.format("CAST(b AS DECIMAL(38,0)) * c * 1000000 " +
        "DIV CAST(n AS DECIMAL(38,0))") + " AS ord_ppm")
    terms.agg(count(lit(1)).cast("bigint").as("k"),
        sum(col("a")).cast("bigint").as("o"),
        sum(col("e_ppm")).cast("bigint").as("e_ppm"),
        sum(col("v_ppm")).cast("bigint").as("v_ppm"),
        sum(col("orn_ppm")).cast("bigint").as("or_num_ppm"),
        sum(col("ord_ppm")).cast("bigint").as("or_den_ppm"))
      .select(col("k"), col("o"), col("e_ppm"), col("v_ppm"),
        when(col("v_ppm") > 0,
          round(expr(cmhChi2FormulaSql), 6))
          .otherwise(lit(null).cast("double")).as("chi2"),
        col("or_num_ppm"), col("or_den_ppm"),
        when(col("or_den_ppm") > 0,
          round(col("or_num_ppm").cast("double") /
            col("or_den_ppm").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("or_mh"))
  }

  /** Per-FAMILY chi-square test of independence WITH Cramér's V —
    * the full-table categorical association pair (q81 reports
    * per-cell contributions; this is the exact-integer TOTAL it
    * deliberately avoided, made order-free by the ppm floor): over
    * the rowCol × colCol contingency table (INCLUDING structural
    * zeros — an empty cell still contributes its expected mass),
    * chi2_ppm = Σ_cells ⌊(o·n − r·c)²·10⁶/(n·r·c)⌋ exact, and
    * V = sqrt(chi2 / (n·min(r−1, c−1))) ∈ [0,1] the ONE double
    * formula rounded 6.
    *
    * @return (famCol, n, n_rows, n_cols, chi2_ppm, chi2, v) — v null
    *         for a degenerate 1×c / r×1 table
    */
  def cramersV(df: DataFrame, famCol: String, rowCol: String,
               colCol: String): DataFrame =
    cramersVFromCells(
      df.select(col(famCol).as("g"), col(rowCol).as("r"),
          col(colCol).as("c"))
        .groupBy(col("g"), col("r"), col("c"))
        .agg(count(lit(1)).cast("bigint").as("o")),
      famCol)

  /** [[cramersV]] from a pre-aggregated (g, r, c, o) contingency-cell
    * table — the streaming-state form
    * ([[graft.streaming.StreamCramersV]]): the per-(family, row,
    * column) counts are the additive sufficient statistic.
    */
  private[graft] def cramersVFromCells(cellsIn: DataFrame,
                                       famCol: String): DataFrame = {
    val cells = cellsIn
      .localCheckpoint(true) // marginals + the dense-cross join
    val rm = cells.groupBy(col("g"), col("r"))
      .agg(sum(col("o")).cast("bigint").as("rm"))
    val cm = cells.groupBy(col("g"), col("c"))
      .agg(sum(col("o")).cast("bigint").as("cm"))
    val n = cells.groupBy(col("g")).agg(sum(col("o")).cast("bigint").as("n"),
      countDistinct(col("r")).cast("bigint").as("n_rows"),
      countDistinct(col("c")).cast("bigint").as("n_cols"))
    def dcm(c: Column): Column = c.cast("decimal(38,0)")
    // dense r×c grid so structural zeros contribute (o=0 ⇒ r·c/n mass).
    // The moodFromCells magnitude refusal (same (o·n − r·c)²·10⁶ ≤
    // (n²/4)²·10⁶ cell bound, same NULL-skipping SUM hazard) is
    // IN-PLAN (r16): every contribution row carries the guard, so a
    // too-big family raises before its chi-square can be summed.
    val dense = rm.join(cm, Seq("g"))
      .join(cells, Seq("g", "r", "c"), "left")
      .na.fill(0L, Seq("o"))
      .join(broadcast(n.select(col("g"), col("n"))), Seq("g"))
      .select(col("g"),
        expr("CASE WHEN n <= 190000000 THEN " +
          "CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(rm AS DECIMAL(38,0)) * cm) * " +
          "(CAST(o AS DECIMAL(38,0)) * n - CAST(rm AS DECIMAL(38,0)) * cm) " +
          "* 1000000 AS DECIMAL(38,0)) DIV " +
          "CAST(CAST(n AS DECIMAL(38,0)) * rm * cm AS DECIMAL(38,0)) " +
          "ELSE CAST(raise_error('cramersV: a family exceeds 1.9e8 " +
          "observations — the exact ppm chi-square algebra needs " +
          "(n^2/4)^2*10^6 < 10^38; sample first') AS DECIMAL(38,0)) END")
          .as("contrib"))
    val chi = dense.groupBy(col("g"))
      .agg(sum(col("contrib")).cast("bigint").as("chi2_ppm"))
    chi.join(broadcast(n), Seq("g"))
      .select(col("g").as(famCol), col("n"), col("n_rows"), col("n_cols"),
        col("chi2_ppm"),
        round(col("chi2_ppm").cast("double") / lit(1000000.0), 6).as("chi2"),
        when(least(col("n_rows"), col("n_cols")) > 1,
          round(sqrt(col("chi2_ppm").cast("double") / lit(1000000.0) /
            (col("n").cast("double") *
              (least(col("n_rows"), col("n_cols")) - 1).cast("double"))), 6))
          .otherwise(lit(null).cast("double")).as("v"))
  }

  /** Per-group EXACT SKEWNESS + EXCESS KURTOSIS (the population
    * moment-shape pair — Pearson's g1/g2): the third- and fourth-
    * moment companions of the corpus's mean/variance machinery, and
    * the distribution-shape diagnostics a quality pipeline reads
    * before trusting a parametric test (q156's ANOVA assumes what
    * these measure).
    *
    * EXACT sufficient statistics with an algebra that makes n
    * CANCEL: with raw moment sums S=Σv, Q=Σv², C=Σv³, D=Σv⁴,
    *   A2 = n·Q − S²                        (= n²·m2)
    *   A3 = n²·C − 3n·S·Q + 2S³             (= n³·m3)
    *   A4 = n³·D − 4n²·S·C + 6n·S²·Q − 3S⁴  (= n⁴·m4)
    * so g1 = m3/m2^1.5 = A3/(A2·√A2) and g2 = m4/m2² − 3 =
    * A4/A2² − 3 — the n-powers cancel exactly, leaving TWO
    * shared-SQL-text double formulas over exact integers
    * ([[skewFormulaSql]]/[[kurtFormulaSql]]), rounded 6.
    *
    * Magnitude contract ENFORCED in-plan (the anovaOneWay guard
    * convention): every term, every transient PARTIAL SUM of the a3/
    * a4 expressions, and the final values are bounded by
    * 16·(n·max|v|)⁴, which must stay under 9·10³⁷ — keep `valueCol`
    * in units where n·max|v| < ~10⁹ (the q178 contract query uses
    * KILOdollars).
    *
    * @return (famCol, n, a2, skewness, kurtosis_excess) — null shape
    *         measures on zero variance or n < 2
    */
  def skewKurtosis(df: DataFrame, famCol: String,
                   valueCol: String): DataFrame = {
    val rows = df.select(col(famCol).as("g"),
      col(valueCol).cast("long").as("v"))
    def dcm(c: Column): Column = c.cast("decimal(38,0)")
    // the magnitude guard gates through a BROADCAST build side (r16 —
    // previously a separate pre-scan count() action; the broadcast
    // materializes before any probe-side moment task, so the NAMED
    // refusal fires before the quartic sums can overflow under ANSI
    // or NULL-poison under non-ANSI), and the constant is WIDENED
    // from 6 to 16·(n·max|v|)⁴ (the r15 verdict's partial-sum
    // margin): the a4 expression's left-to-right partial sums reach
    // |n³d − 4n²sc| ≤ 5B⁴, |… + 6ns²q| ≤ 11B⁴, |… − 3s⁴| ≤ 14B⁴, and
    // the quartic RAW-SUM term n³·d itself is ≤ B⁴ — so every term,
    // every transient partial sum, the raw moment sums, and the final
    // values fit DECIMAL(38,0) whenever 16·B⁴ < 9·10³⁷.
    val gate = broadcast(rows.groupBy(col("g"))
      .agg((count(lit(1)).cast("double") *
        max(greatest(abs(col("v")), lit(1L)).cast("double"))).as("b"))
      .select(col("g"),
        when(lit(16.0) * col("b") * col("b") * col("b") * col("b") <
            lit(9.0e37), lit(1))
          .otherwise(raise_error(lit(
            "skewKurtosis: a group's quartic moment bound " +
              "16*(n*max|v|)^4 reaches the DECIMAL(38,0) range — " +
              "rescale valueCol to coarser units")).cast("int"))
          .as("__gate")))
    // n sums __gate (always 1) rather than counting, so the guard
    // column stays REFERENCED — pruning would otherwise strip the
    // raise_error projection out of the broadcast build side (the
    // anovaFromCells lesson)
    val m = rows.join(gate, Seq("g"))
      .groupBy(col("g"))
      .agg(sum(col("__gate")).cast("decimal(38,0)").as("n"),
        sum(dcm(col("v"))).as("s"),
        sum(dcm(col("v")) * dcm(col("v"))).as("q"),
        sum(dcm(col("v")) * dcm(col("v")) * dcm(col("v"))).as("c"),
        sum(dcm(col("v")) * dcm(col("v")) * dcm(col("v")) * dcm(col("v")))
          .as("d"))
    m.select(col("g").as(famCol), col("n").cast("bigint").as("n"),
        expr("CAST(n * q - s * s AS DECIMAL(38,0))").as("a2"),
        expr("CAST(n * n * c - 3 * n * s * q + 2 * s * s * s " +
          "AS DECIMAL(38,0))").as("a3"),
        expr("CAST(n * n * n * d - 4 * n * n * s * c " +
          "+ 6 * n * s * s * q - 3 * s * s * s * s " +
          "AS DECIMAL(38,0))").as("a4"))
      .select(col(famCol), col("n"),
        col("a2").cast("bigint").as("a2"),
        when(col("n") >= 2 && col("a2") > 0,
          round(expr(skewFormulaSql), 6))
          .otherwise(lit(null).cast("double")).as("skewness"),
        when(col("n") >= 2 && col("a2") > 0,
          round(expr(kurtFormulaSql), 6))
          .otherwise(lit(null).cast("double")).as("kurtosis_excess"))
  }

  /** g1 = A3/(A2·√A2) over the exact integers — shared verbatim with
    * the oracle.
    */
  val skewFormulaSql: String =
    "CAST(a3 AS DOUBLE) / (CAST(a2 AS DOUBLE) * sqrt(CAST(a2 AS DOUBLE)))"

  /** g2 = A4/A2² − 3 over the exact integers — shared verbatim. */
  val kurtFormulaSql: String =
    "CAST(a4 AS DOUBLE) / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) - 3.0"

  /** Per-FAMILY BROWN–FORSYTHE TEST (Brown & Forsythe 1974 — the
    * median-centered Levene test): are the K samples' DISPERSIONS
    * equal? The variance-equality complement of the location battery
    * (KW/ANOVA/Mood all compare centers): one-way ANOVA F on the
    * absolute deviations z_ij = |v_ij − median_j| from each sample's
    * OWN median — median centering is what makes it robust to
    * non-normality (Levene's mean-centered form is not).
    *
    * EXACT end-to-end: each sample's nearest-rank lower median
    * (position ⌊(n_j+1)/2⌋) is SELECTED from its value-cardinality
    * count table ([[RankCorr.cumFromCounts]] on the injective
    * composite (family, sample) key), z is an exact integer, and the
    * F decomposition is [[anovaFromCells]]'s exact floor algebra with
    * its shared-text formula — so the whole statistic is
    * oracle-exact.
    *
    * @return (famCol, k, n, ssb, ssw, f, eta2) — the ANOVA columns
    *         over the deviations; f is the Brown–Forsythe statistic
    */
  def brownForsythe(df: DataFrame, famCol: String, sampleCol: String,
                    valueCol: String): DataFrame = {
    val cells = df.select(col(famCol).as("g"), col(sampleCol).as("smp"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("g"), col("smp"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("gk", RankCorr.compositeKey(col("g"), col("smp")))
      .localCheckpoint(true) // median pass + the deviation join-back
    val cum = RankCorr.cumFromCounts(
        cells.select(col("gk").as("g"), col("v"), col("cnt")), "v")
      .select(col("g").as("gk"), col("v"), col("cnt"), col("below"))
    val nj = cells.groupBy(col("gk"))
      .agg(sum(col("cnt")).cast("bigint").as("n_j"))
    val med = cum.join(broadcast(
        nj.select(col("gk"), expr("(n_j + 1) DIV 2").as("__pos"))),
        Seq("gk"))
      .filter(col("below") < col("__pos") &&
        col("__pos") <= col("below") + col("cnt"))
      .select(col("gk"), col("v").as("med"))
    val zCells = cells.join(broadcast(med), Seq("gk"))
      .select(col("g"), col("smp"), abs(col("v") - col("med")).as("v"),
        col("cnt"))
      .groupBy(col("g"), col("smp"), col("v"))
      .agg(sum(col("cnt")).as("cnt"))
    anovaFromCells(zCells, famCol)
  }

  /** Per-FAMILY McNEMAR TEST (McNemar 1947) — the PAIRED binary
    * association test: did the same subjects flip between two
    * boolean measurements (before/after, year-over-year)? Only the
    * DISCORDANT pairs carry information: b = (true, false),
    * c = (false, true), chi2 = (b − c)²/(b + c). No continuity
    * correction (determinism over small-sample nicety — the cmh
    * adjudication, stated).
    *
    * EXACT: b and c are plain counts; the numerator is a SQUARE, so
    * the ppm floor ⌊(b−c)²·10⁶/(b+c)⌋ equals truncation in both
    * engines — chi2_ppm is an order-free exact integer, the
    * statistic its one descaling rounded 6. Magnitude: (b−c)²·10⁶
    * fits DECIMAL(38,0) to 10¹⁵ discordant pairs — no refusal
    * needed below row counts that can't exist.
    *
    * @return (famCol, n_pairs, b, c, chi2_ppm, chi2) — chi2 null
    *         when b + c = 0 (no discordant pairs: the test is
    *         undefined)
    */
  def mcnemar(df: DataFrame, famCol: String, aCol: String,
              bCol: String): DataFrame =
    df.select(col(famCol).as("g"), col(aCol).cast("boolean").as("x"),
        col(bCol).cast("boolean").as("y"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        sum(when(col("x") && !col("y"), 1L).otherwise(0L))
          .cast("bigint").as("b"),
        sum(when(!col("x") && col("y"), 1L).otherwise(0L))
          .cast("bigint").as("c"))
      .select(col("g").as(famCol), col("n_pairs"), col("b"), col("c"),
        when(col("b") + col("c") > 0,
          expr("CAST((b - c) * (b - c) AS DECIMAL(38,0)) * 1000000 " +
            "DIV (b + c)").cast("bigint"))
          .otherwise(lit(null).cast("bigint")).as("chi2_ppm"),
        when(col("b") + col("c") > 0,
          round((expr("CAST((b - c) * (b - c) AS DECIMAL(38,0)) " +
            "* 1000000 DIV (b + c)")).cast("double") / lit(1000000.0), 6))
          .otherwise(lit(null).cast("double")).as("chi2"))

  /** Per-FAMILY COCHRAN'S Q TEST (Cochran 1950) — the K-treatment
    * BLOCKED binary test, [[graft.operators.RankCorr.friedman]]'s
    * 0/1 sibling: within each complete block (a subject measured
    * under all K treatments), does success probability differ across
    * treatments?
    *
    * FULLY EXACT — no floor scaling: with column totals T_j, block
    * totals R_i, and S = ΣT_j,
    *   Q = (K−1)·(K·ΣT_j² − S²) / (K·S − ΣR_i²)
    * — numerator and denominator are exact integers, Q the ONE
    * double division rounded 6. Same REFUSALS as friedman:
    * duplicate (block, treatment) cells and incomplete blocks (a
    * missing treatment deflates its column total).
    *
    * @param valueCol boolean-valued success indicator
    * @return (famCol, k, n_blocks, num, den, q) — q null when every
    *         block is all-success or all-failure (den = 0)
    */
  def cochranQ(df: DataFrame, famCol: String, blockCol: String,
               treatmentCol: String, valueCol: String): DataFrame = {
    val rows = df.select(col(famCol).as("g"), col(blockCol).as("b"),
        col(treatmentCol).as("trt"),
        when(col(valueCol).cast("boolean"), 1L).otherwise(0L).as("x"))
      .localCheckpoint(true) // gate subtree + two marginals
    val kg = rows.groupBy(col("g"))
      .agg(countDistinct(col("trt")).cast("long").as("k"))
    // dup/completeness refusals IN-PLAN via the shared broadcast gate
    // (r16 — previously two separate count() actions); sum(x·__gate)
    // keeps the gate referenced, and every output column reads the
    // gated column totals
    val gate = broadcast(RankCorr.completeBlocksGate(rows, kg, "cochranQ"))
    def dcm(c: Column): Column = c.cast("decimal(38,0)")
    val colT = rows.join(gate, Seq("g")).groupBy(col("g"), col("trt"))
      .agg(sum(col("x") * col("__gate")).as("t"),
        min(col("__gate")).as("__g1"))
      .groupBy(col("g"))
      .agg(sum(dcm(col("t")) * dcm(col("t"))).cast("decimal(38,0)").as("t2"),
        sum(col("t")).cast("decimal(38,0)").as("s"),
        min(col("__g1")).as("__g"))
    val rowR = rows.groupBy(col("g"), col("b"))
      .agg(sum(col("x")).as("r"), count(lit(1)).as("c"))
      .groupBy(col("g"))
      .agg(sum(dcm(col("r")) * dcm(col("r"))).cast("decimal(38,0)").as("r2"),
        count(lit(1)).cast("bigint").as("n_blocks"))
    colT.join(rowR, Seq("g")).join(broadcast(kg), Seq("g"))
      .select(col("g").as(famCol), col("k"),
        // ×__g (always 1 when admissible — r17): rowR never joins the
        // gate, so a counts-only projection of n_blocks alone would
        // otherwise prune the refusal out of the colT side entirely
        (col("n_blocks") * col("__g")).cast("bigint").as("n_blocks"),
        ((dcm(col("k")) - 1) * (dcm(col("k")) * col("t2")
          - col("s") * col("s"))).cast("bigint").as("num"),
        (dcm(col("k")) * col("s") - col("r2")).cast("bigint").as("den"))
      .withColumn("q",
        when(col("den") > 0,
          round(col("num").cast("double") / col("den").cast("double"), 6))
          .otherwise(lit(null).cast("double")))
  }
}

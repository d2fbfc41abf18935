package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MULTIPLE-TESTING machinery: the two-sided normal p-value as a
  * SHARED SQL expression and the Benjamini–Hochberg step-up FDR
  * adjustment (Benjamini & Hochberg 1995) — the "which of these K
  * test results survive?" layer over the per-group z statistics the
  * test family (Welch, Wilcoxon, log-rank, …) already emits.
  *
  * CROSS-ENGINE DETERMINISM: a normal CDF is transcendental — there
  * is no exact-integer form — so the p-value is the Abramowitz &
  * Stegun 26.2.17 rational approximation (|ε| < 7.5·10⁻⁸, far below
  * the reported 6 decimals) written ONCE as SQL text and evaluated
  * from the same parse on both engines ([[normalTwoSidedPSql]] is
  * `expr()`ed on the Spark side and textually embedded in the DuckDB
  * oracle), on z values already rounded to 6 — identical double
  * inputs, identical IEEE expression tree, identical doubles out.
  * The BH suffix minimum min_{j≥i}(m·p_(j)/j) is a single
  * descending-rank fold over the test table, which is MODEL-SIZED by
  * construction (one row per tested group) — so it runs on the
  * driver in sorted order under a named-cap refusal (the
  * kaplanMeier convention), bit-deterministic under any
  * partitioning; the oracle reproduces it as a min over the rank
  * pair set (a min over the same candidate set is order-free and
  * equals the fold).
  */
object StatTests {

  /** Two-sided normal p-value of a z-score column as SQL text —
    * Abramowitz & Stegun 26.2.17 (Zelen & Severo), Horner form.
    * Shared verbatim between Spark `expr()` and the DuckDB oracle.
    */
  def normalTwoSidedPSql(z: String): String = {
    val t = s"(1.0 / (1.0 + 0.2316419 * abs($z)))"
    s"least(1.0, 2.0 * (exp(-($z * $z) / 2.0) / " +
      s"sqrt(6.283185307179586)) * ($t * (0.319381530 + $t * " +
      s"(-0.356563782 + $t * (1.781477937 + $t * (-1.821255978 + " +
      s"$t * 1.330274429))))))"
  }

  /** Benjamini–Hochberg adjusted p-values over a (id, p) table:
    * rank ascending by (p, id), p_adj(i) = min(1, min_{j≥i} m·p_(j)/j)
    * — the step-up procedure's monotone envelope. The input p must
    * already be rounded (both engines see identical doubles). The
    * table is collected under a named cap (it is one row per TESTED
    * GROUP — model-sized by construction) and the suffix min folded
    * in descending-rank order on the driver.
    *
    * @return (idCol, p, i, m, p_adj, reject) ordered by i; reject =
    *         p_adj ≤ alpha decided on the ROUNDED p_adj (the same
    *         6-decimal value both engines hash)
    */
  def bhAdjust(df: DataFrame, idCol: String, pCol: String,
               alpha: Double = 0.05, maxTests: Long = 100000L)
      : DataFrame = {
    val spark = df.sparkSession
    val idType = df.select(col(idCol)).schema.head.dataType
    val n = df.count()
    require(n > 0 && n <= maxTests,
      s"bhAdjust: $n tests — need 1 <= tests <= maxTests=$maxTests " +
        "(the p-value table is one row per tested group; aggregate " +
        "further first)")
    val sorted = df.select(col(idCol), col(pCol).cast("double"))
      .orderBy(col(pCol).desc, col(idCol).desc).collect()
    val m = sorted.length
    var runMin = 1.0
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // descending rank: i = m, m-1, ..., 1
    val out = sorted.zipWithIndex.map { case (r, idx) =>
      val i = m - idx
      val q = math.min(1.0, m.toDouble * r.getDouble(1) / i.toDouble)
      if (q < runMin) runMin = q
      val pAdj = r6(runMin)
      org.apache.spark.sql.Row(r.get(0), r.getDouble(1),
        i.toLong, m.toLong, pAdj, pAdj <= alpha)
    }.reverse
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(StructField(idCol, idType),
        StructField("p", DoubleType), StructField("i", LongType),
        StructField("m", LongType), StructField("p_adj", DoubleType),
        StructField("reject", BooleanType))))
  }

  /** POST-HOC PAIRWISE WELCH contrasts under BH-FDR (r17) — the
    * "WHICH pairs differ?" layer the omnibus battery stops short of:
    * [[graft.operators.GroupTests.anovaOneWay]] /
    * [[graft.operators.RankCorr.kruskalWallis]] say "these K samples
    * are not all equal"; this runs Welch's unequal-variance t on
    * EVERY unordered sample pair within every family (the q108
    * moment algebra — exact integer (n, Σv, Σv²) tuples, the t a
    * fixed IEEE formula over them) and feeds all contrasts jointly
    * through [[bhAdjust]], so the reported rejections control the
    * FALSE DISCOVERY RATE across the whole contrast table — the
    * statistically honest version of eyeballing K² raw p-values.
    *
    * Determinism contract (the q160 conventions): t rounded 6, the
    * two-sided p from the shared A&S 26.2.17 normal text on the
    * rounded t (the normal approximation to Welch's t-reference is
    * the documented convention — corpus-scale dof make the
    * difference ≪ the 6 reported decimals), p rounded 9, BH's suffix
    * minimum folded driver-side over the model-sized contrast table.
    *
    * Scale shape: one row-scale pass to the (family, sample) moment
    * table, then sample-cardinality² pair volume — never rows²; the
    * magnitude gate is the anovaFromCells broadcast bound multiplied
    * into n (pruning-proof).
    *
    * Pairs with n ≤ 1 on either side or zero pooled variance have no
    * t and are EXCLUDED from the BH family (stated — they carry no
    * evidence either way). Sample labels must not contain '|' (the
    * contrast id separator; labels are cast to string).
    *
    * @return (contrast, famCol, s_a, s_b, n_a, n_b, t, p, i, m,
    *         p_adj, reject) ordered by BH rank i; t > 0 means s_a's
    *         mean is larger
    */
  def posthocPairwiseWelch(df: DataFrame, famCol: String,
                           sampleCol: String, valueCol: String,
                           alpha: Double = 0.05,
                           maxTests: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.Column
    val rows = df.select(col(famCol).as("g"),
      col(sampleCol).cast("string").as("smp"),
      col(valueCol).cast("long").as("v"))
    val gate = broadcast(rows.groupBy(col("g"))
      .agg((count(lit(1)).cast("double") *
        max(greatest(abs(col("v")), lit(1L)).cast("double"))).as("b"))
      .select(col("g"),
        when(col("b") * col("b") < lit(9.0e37), lit(1L))
          .otherwise(raise_error(lit(
            "posthocPairwiseWelch: a family's moment bound " +
              "(n*max|v|)^2 reaches the DECIMAL(38,0) range — " +
              "rescale valueCol to coarser units")).cast("bigint"))
          .as("__gate")))
    def dcm(c: Column): Column = c.cast("decimal(38,0)")
    val m = rows.join(gate, Seq("g"))
      .groupBy(col("g"), col("smp"))
      .agg(sum(col("__gate")).cast("bigint").as("n"),
        sum(dcm(col("v"))).cast("decimal(38,0)").as("s"),
        sum(dcm(col("v")) * dcm(col("v"))).cast("decimal(38,0)").as("q"))
    val pairs = m.as("a").join(m.as("b"),
        col("a.g") === col("b.g") && col("a.smp") < col("b.smp"))
      .select(col("a.g").as("g"),
        col("a.smp").as("s_a"), col("b.smp").as("s_b"),
        col("a.n").as("na"), col("b.n").as("nb"),
        col("a.s").as("sa"), col("b.s").as("sb"),
        col("a.q").as("qa"), col("b.q").as("qb"))
      .filter(col("na") > 1 && col("nb") > 1)
    // the q108 Welch shapes, verbatim per side
    val meanA = col("sa").cast("double") / col("na")
    val meanB = col("sb").cast("double") / col("nb")
    val vnA = ((col("na") * col("qa") - col("sa") * col("sa"))
      .cast("double") /
      (col("na") * (col("na") - 1)).cast("double")) / col("na")
    val vnB = ((col("nb") * col("qb") - col("sb") * col("sb"))
      .cast("double") /
      (col("nb") * (col("nb") - 1)).cast("double")) / col("nb")
    val tested = pairs
      .withColumn("t",
        when(vnA + vnB > 0.0,
          round((meanA - meanB) / sqrt(vnA + vnB), 6))
          .otherwise(lit(null).cast("double")))
      .filter(col("t").isNotNull)
      .withColumn("p", round(expr(normalTwoSidedPSql("t")), 9))
      .withColumn("contrast", concat_ws("|",
        col("g").cast("string"), col("s_a"), col("s_b")))
      .localCheckpoint(true) // count + collect in bhAdjust + join-back
    bhAdjust(tested.select(col("contrast"), col("p")),
        "contrast", "p", alpha, maxTests)
      .join(tested.select(col("contrast"), col("g").as(famCol),
        col("s_a"), col("s_b"), col("na").as("n_a"),
        col("nb").as("n_b"), col("t")), Seq("contrast"))
      .select(col("contrast"), col(famCol), col("s_a"), col("s_b"),
        col("n_a"), col("n_b"), col("t"), col("p"), col("i"), col("m"),
        col("p_adj"), col("reject"))
      .orderBy(col("i"))
  }

  /** COCHRAN–ARMITAGE TREND TEST (r17, Cochran 1954 / Armitage
    * 1955) — the ordered-exposure BINARY test completing the trend
    * family: [[graft.operators.RankCorr.jonckheereTerpstra]] orders
    * CONTINUOUS responses, this orders PROPORTIONS — "does success
    * probability rise along the dose ladder?" per family, the
    * epidemiology/dose-response workhorse.
    *
    * EXACT (score-test / binomial-variance form, stated): per-dose
    * (n_i, y_i) cells with integral dose scores w_i give T = Σw_i·y_i,
    * W = Σw_i·n_i, WW = Σw_i²·n_i, all exact integers; the statistic
    * z = (n·T − Y·W) / sqrt(Y·(n−Y)·(n·WW − W²)/n) is the ONE
    * shared-text double formula ([[caZFormulaSql]]) over them,
    * rounded 6 — z > 0 means success probability increases with the
    * dose score.
    *
    * Magnitude gate: the integer sums are emitted as BIGINT, so both
    * n·max|w| (bounds T, W) and n·max|w|² (bounds WW) must stay
    * under 9·10¹⁸ — refused through the standard broadcast gate
    * multiplied into the counts (pruning-proof).
    *
    * @param doseCol integral — its VALUE is the trend score (the
    *                standard equally-spaced choice is 0..k−1; any
    *                monotone integral scoring works)
    * @param outcomeCol boolean-castable
    * @return (famCol, k, n, y, t, wn, wwn, z) — z null when every
    *         outcome agrees (Y ∈ {0, n}) or every dose is the same
    *         (variance term 0)
    */
  def cochranArmitage(df: DataFrame, famCol: String, doseCol: String,
                      outcomeCol: String): DataFrame = {
    import org.apache.spark.sql.Column
    val rows = df.select(col(famCol).as("g"),
      col(doseCol).cast("long").as("w"),
      when(col(outcomeCol).cast("boolean"), 1L).otherwise(0L).as("yy"))
    val gate = broadcast(rows.groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("nd"),
        max(greatest(abs(col("w")), lit(1L)).cast("double")).as("mw"))
      .select(col("g"),
        when(col("nd") * col("mw") < lit(9.0e18) &&
          col("nd") * col("mw") * col("mw") < lit(9.0e18), lit(1L))
          .otherwise(raise_error(lit(
            "cochranArmitage: a family's score bound n*max(|w|,|w|^2) " +
              "reaches the BIGINT range — rescale doseCol to coarser " +
              "scores")).cast("bigint")).as("__gate")))
    def dcm(c: Column): Column = c.cast("decimal(38,0)")
    val agg = rows.join(gate, Seq("g"))
      .groupBy(col("g"))
      .agg(sum(col("__gate")).cast("bigint").as("n"),
        count_distinct(col("w")).cast("bigint").as("k"),
        sum(col("yy")).cast("bigint").as("y"),
        sum(dcm(col("w")) * dcm(col("yy"))).cast("decimal(38,0)")
          .cast("bigint").as("t"),
        sum(dcm(col("w"))).cast("decimal(38,0)").cast("bigint").as("wn"),
        sum(dcm(col("w")) * dcm(col("w"))).cast("decimal(38,0)")
          .cast("bigint").as("wwn"))
    agg.select(col("g").as(famCol), col("k"), col("n"), col("y"),
      col("t"), col("wn"), col("wwn"),
      when(col("y") > 0 && col("y") < col("n") &&
        expr(caVarTermSql) > 0,
        round(expr(caZFormulaSql), 6))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** n·WW − W² — the dose-dispersion term of the CA variance, in
    * doubles off exact integers; shared with the z text.
    */
  val caVarTermSql: String =
    "CAST(n AS DOUBLE) * CAST(wwn AS DOUBLE) " +
      "- CAST(wn AS DOUBLE) * CAST(wn AS DOUBLE)"

  /** The Cochran–Armitage z over the exact integers (n, y, t, wn,
    * wwn) — shared verbatim with the oracle.
    */
  val caZFormulaSql: String =
    "(CAST(n AS DOUBLE) * CAST(t AS DOUBLE) " +
      "- CAST(y AS DOUBLE) * CAST(wn AS DOUBLE)) / " +
      "sqrt(CAST(y AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(y AS DOUBLE)) " +
      "* (CAST(n AS DOUBLE) * CAST(wwn AS DOUBLE) " +
      "- CAST(wn AS DOUBLE) * CAST(wn AS DOUBLE)) / CAST(n AS DOUBLE))"
}

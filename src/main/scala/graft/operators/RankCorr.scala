package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group SPEARMAN rank correlation with exact tie handling — the
  * monotone-association metric (robust to outliers and nonlinearity,
  * unlike Pearson): ρ = Pearson correlation of the per-group
  * MIDRANKS of x and y (Spearman 1904; the midrank tie convention is
  * the standard one).
  *
  * Exactness: ranks are kept as DOUBLED midranks (2·midrank is
  * always an integer — ties average two integers), so every sum in
  * the Pearson formula is exact DECIMAL(38,0) algebra; ρ is ONE
  * double division of two exact aggregates, rounded — the q71/q105
  * convention. Engine-portable: both engines read the same integer
  * sums (exact in double up to group sizes of ~2^17 rows at the n³
  * growth of Σm2², far past any verify SF; the decimal keeps the
  * ENGINE exact to ~10^9-row groups regardless).
  *
  * Scale shape (the tokenBudgetPerGroup discipline — never a
  * row-scale window, partitioned or not): per-(group, value) count
  * tables first (value-cardinality), then ONE composite-key
  * [[Ranking.globalRank]] + [[PrefixSum]] over the rank axis gives
  * within-group cumulative counts below each value (prior-group
  * masses off a second group-cardinality PrefixSum, broadcast back);
  * doubled midrank m2 = 2·cumBelow + cnt + 1. Rows join their two
  * midrank tables (row-scale equi-joins against value-cardinality
  * sides) and one hash aggregate per group finishes.
  */
object RankCorr {

  /** (g, vc, cnt, below) — the per-(group, value) count table with
    * the WITHIN-GROUP cumulative row count strictly below each value:
    * composite-key [[Ranking.globalRank]] + [[PrefixSum]] over the
    * rank axis, prior-group masses off a group-cardinality PrefixSum
    * broadcast back. The shared primitive under doubled midranks
    * (here) and order-statistic selection ([[RobustStats]]).
    */
  private[operators] def groupCumCounts(rows: DataFrame, vc: String): DataFrame =
    cumFromCounts(rows.groupBy(col("g"), col(vc))
      .agg(count(lit(1)).as("cnt")), vc)

  /** Same, from a PRE-AGGREGATED (g, vc, cnt) count table — the form
    * streaming maintenance holds as state (counts are the additive
    * sufficient statistic for every order-statistic readout).
    */
  private[operators] def cumFromCounts(counts: DataFrame, vc: String): DataFrame = {
    val pv = counts.localCheckpoint(true) // feeds the rank pass and group totals
    val ranked = Ranking.globalRank(pv, Seq("g", vc), "__gr", 0)
    val cum = PrefixSum.runningTotal(ranked, "__gr", "cnt", "__cum")
    val gt = pv.groupBy(col("g")).agg(sum(col("cnt")).as("__tot"))
    val prior = PrefixSum.runningTotal(gt, "g", "__tot", "__gcum")
      .select(col("g"), (col("__gcum") - col("__tot")).as("__prior"))
    cum.join(broadcast(prior), Seq("g"))
      .select(col("g"), col(vc), col("cnt"),
        (col("__cum") - col("cnt") - col("__prior")).cast("bigint").as("below"),
        // the global rank axis rides along: consumers that need a
        // SECOND prefix quantity in the same order (a value-mass
        // cumulation for trimmed sums) prefix-sum over it directly
        col("__gr"))
  }

  /** (group, value, m2) — doubled midranks of `vc` within each group,
    * from the per-(group, value) count table.
    */
  private def midrank2(rows: DataFrame, vc: String): DataFrame =
    groupCumCounts(rows, vc)
      .select(col("g"), col(vc),
        (lit(2) * col("below") + col("cnt") + lit(1)).cast("bigint").as("m2"))

  /** Per-group Spearman ρ between two integral columns (scale
    * decimals to integer units first — the cents convention).
    *
    * @return (groupCol, n, rho) — rho null for degenerate groups
    *         (constant x or y, or a single row), rounded to `scale`
    */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
               yCol: String, scale: Int = 6): DataFrame = {
    val rows = df.select(col(groupCol).as("g"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .localCheckpoint(true) // feeds both midrank passes and the join
    val mx = midrank2(rows, "x").withColumnRenamed("m2", "rx")
    val my = midrank2(rows, "y").withColumnRenamed("m2", "ry")
    val joined = rows
      .join(mx, Seq("g", "x"))
      .join(my, Seq("g", "y"))
    def d(c: Column): Column = c.cast("decimal(38,0)")
    val agg = joined.groupBy(col("g"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(d(col("rx"))).as("sx"), sum(d(col("ry"))).as("sy"),
        sum(d(col("rx")) * d(col("ry"))).as("sxy"),
        sum(d(col("rx")) * d(col("rx"))).as("sxx"),
        sum(d(col("ry")) * d(col("ry"))).as("syy"))
    val num = (d(col("n")) * col("sxy") - col("sx") * col("sy"))
      .cast("decimal(38,0)")
    val varx = (d(col("n")) * col("sxx") - col("sx") * col("sx"))
      .cast("decimal(38,0)")
    val vary = (d(col("n")) * col("syy") - col("sy") * col("sy"))
      .cast("decimal(38,0)")
    agg.select(col("g").as(groupCol), col("n"),
      when(varx > 0 && vary > 0,
        round(num.cast("double") /
          sqrt(varx.cast("double") * vary.cast("double")), scale))
        .otherwise(lit(null).cast("double")).as("rho"))
  }
}

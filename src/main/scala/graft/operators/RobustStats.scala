package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group MEDIAN / MAD robust statistics and the 3·MAD outlier
  * rule (Hampel 1974; the standard robust alternative to mean±3σ,
  * which outliers themselves corrupt) — EXACT, in integers end to
  * end: the median is kept DOUBLED (med2 = lo + hi central order
  * statistics, integral for integral input even at even n) and the
  * MAD QUADRUPLED (mad4 = lo + hi of the doubled absolute
  * deviations |2v − med2|), so the outlier test
  * |v − med| > 3·MAD becomes the integer comparison
  * 2·|2v − med2| > 3·mad4 — no float anywhere,
  * bit-deterministic under any partitioning and engine.
  *
  * Scale shape: EVERYTHING runs on per-(group, value) COUNT tables —
  * the additive sufficient statistic. The raw rows are touched once
  * (the counting aggregate, map-side combining); order statistics
  * are then SELECTED from within-group cumulative counts
  * ([[RankCorr.cumFromCounts]] — composite rank + PrefixSum, never a
  * row-scale window; a value sits at position p iff
  * below < p ≤ below + cnt), and even the DEVIATION pass is
  * value-cardinality: |2v − med2| re-aggregates the count table, not
  * the rows. Additivity is also what makes the statistic
  * streamable — [[graft.streaming.StreamRobustStats]] holds exactly
  * this count table as state.
  */
object RobustStats {

  /** Per-group robust summary of an integral column.
    *
    * @return (groupCol, n, med2, mad4, n_outliers): med2 = 2·median,
    *         mad4 = 4·MAD, n_outliers = rows with |v−med| > 3·MAD
    */
  def madSummary(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    madSummaryFromCounts(counts).withColumnRenamed("g", groupCol)
  }

  /** [[madSummary]] from a pre-aggregated (g, v, cnt) count table —
    * the streaming-state form; `g` stays `g` in the output.
    */
  private[graft] def madSummaryFromCounts(countsIn: DataFrame): DataFrame = {
    val counts = countsIn.localCheckpoint(true) // med pass + dev pass
    val med2 = orderStat2(counts).withColumnRenamed("stat2", "med2")
    // deviation COUNT table: |2v − med2| at value-cardinality
    val dev = counts
      .join(broadcast(med2.select(col("g"), col("med2"))), Seq("g"))
      .select(col("g"), abs(lit(2) * col("v") - col("med2")).cast("long").as("v"),
        col("cnt"))
      .groupBy(col("g"), col("v")).agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint(true) // mad pass + flag pass
    val mad4 = orderStat2(dev).withColumnRenamed("stat2", "mad4")
    val flagged = dev
      .join(broadcast(mad4.select(col("g"), col("mad4"))), Seq("g"))
      .groupBy(col("g"))
      .agg(sum(col("cnt")).cast("bigint").as("n"),
        sum(when(lit(2) * col("v") > lit(3) * col("mad4"), col("cnt"))
          .otherwise(0L)).cast("bigint").as("n_outliers"))
    flagged.join(med2, Seq("g")).join(mad4, Seq("g"))
      .select(col("g"), col("n"), col("med2"), col("mad4"),
        col("n_outliers"))
  }

  /** Per-group NEAREST-RANK quantile bands — exact order statistics
    * at each requested percent (value at position ⌈n·P/100⌉, the
    * classic nearest-rank definition: always an actual data value,
    * no interpolation, integer arithmetic end to end). One cumulative
    * count table serves every band; each percent is one
    * value-cardinality selection against broadcast per-group
    * positions.
    *
    * @return (groupCol, n, p<P1>, p<P2>, ...) — one bigint column per
    *         requested percent
    */
  def quantilesNearestRank(df: DataFrame, groupCol: String, valueCol: String,
                           percents: Seq[Int]): DataFrame = {
    val counts = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    quantilesFromCounts(counts, percents).withColumnRenamed("g", groupCol)
  }

  /** [[quantilesNearestRank]] from a pre-aggregated count table. */
  private[graft] def quantilesFromCounts(counts: DataFrame,
                                         percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100], got $percents")
    val cum = RankCorr.cumFromCounts(counts, "v").localCheckpoint(true)
    val n = cum.groupBy(col("g"))
      .agg(sum(col("cnt")).cast("bigint").as("n"))
    val bands = percents.map { p =>
      val pos = n.select(col("g"),
        expr(s"greatest(1L, (n * $p + 99) DIV 100)").as("__pos"))
      cum.join(broadcast(pos), Seq("g"))
        .filter(col("below") < col("__pos") &&
          col("__pos") <= col("below") + col("cnt"))
        .select(col("g"), col("v").cast("bigint").as(s"p$p"))
    }
    bands.foldLeft(n)((acc, b) => acc.join(b, Seq("g")))
      .select((col("g") +: col("n") +: percents.map(p => col(s"p$p"))): _*)
  }

  /** Per-group TRIMMED MEAN — drop the lowest and highest
    * k = ⌊n·trimBps/10000⌋ rows per group and average the rest: the
    * robust location estimate that DISCARDS tails where the
    * winsorized mean (q125) clips them. Exact: the trimmed SUM is a
    * difference of two within-group cumulative value masses,
    * CUMV(n−k) − CUMV(k), where CUMV(p) interpolates INSIDE a tied
    * value-row as cumv_rows_through(r) − (below(r)+cnt(r)−p)·v(r) —
    * pure integer/decimal algebra (tie order cannot matter: every
    * row at the boundary carries the same v), and the prior-group
    * value mass cancels in the difference, so ONE value-mass
    * PrefixSum over the shared rank axis serves every group. The
    * k = 0 regime has NO lower boundary row, and because the
    * cumulation is global the missing read is the group's PRIOR
    * value mass (everything ranked before it), not 0 — supplied by
    * the same group-cardinality prefix discipline
    * [[RankCorr.cumFromCounts]] uses for prior counts. Mean is
    * the ONE double division, rounded to 6.
    *
    * @param trimBps trim fraction per side in basis points
    *                (1000 = 10%); n − 2k ≥ 1 enforced per group
    * @return (groupCol, n, n_kept, trimmed_sum, trimmed_mean)
    */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  trimBps: Int = 1000): DataFrame = {
    require(trimBps >= 0 && trimBps < 5000,
      s"trimBps must be in [0, 5000), got $trimBps")
    val counts = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("__vc",
        (col("v").cast("decimal(19,0)") * col("cnt").cast("decimal(19,0)"))
          .cast("decimal(38,0)"))
    // the value-mass axis rides the SAME fused cumulation pass as the
    // count axis (r16 — previously a whole extra PrefixSum pass over
    // the shared rank axis plus a prior-group-mass correction; `cumv`
    // is WITHIN-GROUP inclusive, so position 0 is simply mass 0)
    val cum = RankCorr.cumFromCountsWith(counts, "v", Some("__vc"))
      .localCheckpoint(true) // two boundary selections + group totals
    val pos = cum.groupBy(col("g"))
      .agg(sum(col("cnt")).cast("bigint").as("n"))
      .withColumn("__k", expr(s"n * $trimBps DIV 10000"))
      .withColumn("__hi", col("n") - col("__k"))
    // CUMV at position p: the boundary row r has below < p ≤ below+cnt;
    // CUMV(p) = cumv(r) − (below+cnt−p)·v  (p = 0 ⇒ no row ⇒ mass 0)
    def at(pCol: String, out: String): DataFrame = cum
      .join(broadcast(pos.select(col("g"), col(pCol).as("__p"))), Seq("g"))
      .filter(col("below") < col("__p") &&
        col("__p") <= col("below") + col("cnt"))
      .select(col("g"),
        (col("cumv") -
          (col("below") + col("cnt") - col("__p")).cast("decimal(19,0)") *
            col("v").cast("decimal(19,0)")).cast("decimal(38,0)").as(out))
    val hi = at("__hi", "__hiv")
    val lo = at("__k", "__lov")
    val lov = coalesce(col("__lov"), lit(0).cast("decimal(38,0)"))
    pos.join(hi, Seq("g"))
      .join(lo, Seq("g"), "left")
      .select(col("g").as(groupCol), col("n"),
        (col("n") - col("__k") * 2).cast("bigint").as("n_kept"),
        (col("__hiv") - lov).cast("bigint").as("trimmed_sum"),
        round((col("__hiv") - lov).cast("double") /
          (col("n") - col("__k") * 2).cast("double"), 6).as("trimmed_mean"))
  }

  /** (g, stat2) — lo + hi central order statistics per group
    * (= 2·median, exact) from a (g, v, cnt) count table. Selection
    * positions lo = ⌊(n+1)/2⌋ and hi = ⌈(n+1)/2⌉ are
    * group-cardinality and broadcast; the value at position p is the
    * unique row with below < p ≤ below + cnt.
    */
  private def orderStat2(counts: DataFrame): DataFrame = {
    val cum = RankCorr.cumFromCounts(counts, "v").localCheckpoint(true)
    val pos = cum.groupBy(col("g"))
      .agg(sum(col("cnt")).cast("bigint").as("__n"))
      .select(col("g"), expr("(__n + 1) DIV 2").as("__lo"),
        expr("(__n + 2) DIV 2").as("__hi"))
    def at(p: String): DataFrame = cum
      .join(broadcast(pos), Seq("g"))
      .filter(col("below") < col(p) &&
        col(p) <= col("below") + col("cnt"))
      .select(col("g"), col("v").as(p + "_v"))
    at("__lo").join(at("__hi"), Seq("g"))
      .select(col("g"),
        (col("__lo_v") + col("__hi_v")).cast("bigint").as("stat2"))
  }

  /** Per-group THEIL–SEN ROBUST SLOPE (Theil 1950, Sen 1968) — the
    * median-of-pairwise-slopes trend estimator: up to ~29% of the
    * points can be arbitrary outliers before the estimate breaks,
    * where q84's least-squares slope is corrupted by one. The
    * point-estimate companion of q112's Mann–Kendall trend TEST
    * (same pair algebra, slope instead of sign).
    *
    * DETERMINISTIC cross-engine: each pairwise slope is ONE double
    * division of two exact integers ((y_b−y_a)/(x_b−x_a) — identical
    * IEEE result in any engine); the slope estimate is the
    * NEAREST-RANK LOWER MEDIAN of the pair slopes (position
    * ⌊(m+1)/2⌋ — selection by value, so tie order can't matter;
    * classical interpolation would average two doubles, still exact,
    * but lower-median keeps the single-order-statistic discipline),
    * and the intercept is the lower median of the residuals
    * y_i − slope·x_i. Deliberately UNROUNDED: the selected values are
    * bit-identical across engines already, and round(x, 9) on a
    * large-magnitude double asks for more significant digits than a
    * double holds — engines' rounding implementations diverge in
    * ulps exactly there (measured at sf1: a 2.16e10 intercept).
    *
    * Scale contract: pair volume is points² per group — REFUSES
    * above `maxPoints` per group (the q112 calendar-bounded-series
    * regime: months/days per group, never raw rows; pre-aggregate to
    * the time grain first).
    *
    * @return (groupCol, n_points, n_pairs, slope, intercept); a
    *         group with NO distinct-x pair (a single time point) has
    *         no slope and is absent from the output
    */
  def theilSen(df: DataFrame, groupCol: String, xCol: String,
               yCol: String, maxPoints: Long = 5000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.select(col(groupCol).as("g"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .localCheckpoint(true) // gate subtree + pair join + residual pass
    // maxPoints refusal IN-PLAN (r17 — previously its own count()
    // action): the group sizes gate through a BROADCAST build side
    // (group-cardinality, materializes before any pair-join task) and
    // the gate multiplies into x (always ×1 for admissible groups) so
    // column pruning can't strip the raise_error projection — the
    // anovaFromCells convention
    val szs = broadcast(pts.groupBy(col("g"))
      .agg(count(lit(1)).as("__c"))
      .select(col("g"),
        when(col("__c") <= maxPoints, lit(1L))
          .otherwise(raise_error(concat(
            lit("theilSen: group "), col("g").cast("string"),
            lit(s" exceeds maxPoints=$maxPoints points — pair " +
              "volume is points\u00b2; aggregate to a coarser time " +
              "grain first"))).cast("bigint")).as("__gate")))
    val gated = pts.join(szs, Seq("g"))
      .select(col("g"), (col("x") * col("__gate")).as("x"), col("y"))
    val slopes = gated.as("a").join(gated.as("b"),
        col("a.g") === col("b.g") && col("a.x") < col("b.x"))
      .select(col("a.g").as("g"),
        ((col("b.y") - col("a.y")).cast("double") /
          (col("b.x") - col("a.x")).cast("double")).as("sl"))
    val wS = Window.partitionBy(col("g")).orderBy(col("sl"))
    val mS = slopes
      .withColumn("rn", row_number().over(wS))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("rn") === expr("(m + 1) DIV 2"))
      .select(col("g"), col("sl").as("slope"), col("m").as("n_pairs"))
    val resid = gated.join(broadcast(mS), Seq("g"))
      .select(col("g"), col("slope"), col("n_pairs"),
        (col("y").cast("double") - col("slope") * col("x").cast("double"))
          .as("r"))
    val wR = Window.partitionBy(col("g")).orderBy(col("r"))
    val mI = resid
      .withColumn("rn", row_number().over(wR))
      .withColumn("np", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("rn") === expr("(np + 1) DIV 2"))
      .select(col("g"), col("slope"),
        col("n_pairs").cast("bigint").as("n_pairs"),
        col("np").cast("bigint").as("n_points"),
        col("r").as("intercept"))
    mI.select(col("g").as(groupCol), col("n_points"), col("n_pairs"),
      col("slope"), col("intercept"))
  }
}

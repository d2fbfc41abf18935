package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVIVAL ANALYSIS — the Kaplan–Meier product-limit estimator
  * (Kaplan & Meier 1958) and the two-sample log-rank test (Mantel
  * 1966): time-to-event curves under RIGHT CENSORING, the churn /
  * retention / reliability family none of the moment or rank
  * statistics cover (a censored observation says "survived AT LEAST
  * t" — dropping it biases every mean/median downward).
  *
  * EXACTNESS SHAPE: everything integral is exact — the per-(group,
  * time) (events, censored) COUNT table is the additive sufficient
  * statistic, and the at-risk count n(t) = N_g − #{obs with time < t}
  * comes from the shared [[RankCorr.cumFromCounts]] cumulation
  * (value-cardinality, never a row-scale window). The survival
  * product Π(1 − d_i/n_i) is inherently a SEQUENTIAL float fold, so
  * it runs on the DRIVER over the collected event-time table in
  * ascending (group, t) order — the same multiply order the oracle's
  * windowed product() uses, making the doubles bit-identical — under
  * a named-cap refusal (the model-sized-collect convention: the
  * table IS the query output, group×distinct-event-time rows).
  */
object Survival {

  /** Kaplan–Meier curve per group.
    *
    * @param eventCol 1 = the event occurred at `timeCol`; 0 = right-
    *                 censored at `timeCol` (still in the risk set
    *                 through t)
    * @param maxTableRows refusal cap on the collected (group, time)
    *                     table — the output itself
    * @return one row per (group, EVENT time): (groupCol, t, n_risk,
    *         d, survival) with survival = Π_{t_i ≤ t} (1 − d_i/n_i)
    *         rounded to 9, ordered by (group, t)
    */
  def kaplanMeier(df: DataFrame, groupCol: String, timeCol: String,
                  eventCol: String,
                  maxTableRows: Long = 200000L): DataFrame =
    kaplanMeierFromCounts(
      df.select(col(groupCol).as("g"),
          col(timeCol).cast("long").as("t"),
          col(eventCol).cast("int").as("e"))
        .groupBy(col("g"), col("t"))
        .agg(sum(when(col("e") === 1, 1L).otherwise(0L)).as("d"),
          count(lit(1)).as("cnt")),
      groupCol, maxTableRows)

  /** [[kaplanMeier]] from a pre-aggregated (g, t, d, cnt) count table
    * — the streaming-state form ([[graft.streaming.StreamSurvival]]):
    * events and totals per (group, time) are the ADDITIVE sufficient
    * statistic of the whole estimator.
    */
  private[graft] def kaplanMeierFromCounts(countsIn: DataFrame,
                                           groupCol: String,
                                           maxTableRows: Long = 200000L)
      : DataFrame = {
    val spark = countsIn.sparkSession
    val counts = countsIn.localCheckpoint(true) // cumulation + collect
    // n_risk(t) = N_g − #{time < t}: within-group cumulative counts
    val cum = RankCorr.cumFromCounts(
      counts.select(col("g"), col("t"), col("cnt")), "t")
    val ng = counts.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val steps = counts.join(cum, Seq("g", "t"))
      .join(broadcast(ng), Seq("g"))
      .filter(col("d") > 0)
      .select(col("g"), col("t"), (col("n_g") - col("below"))
        .cast("bigint").as("n_risk"), col("d").cast("bigint").as("d"))
    val nRows = steps.count()
    require(nRows <= maxTableRows,
      s"kaplanMeier: $nRows group×event-time rows > maxTableRows=" +
        s"$maxTableRows — the curve IS this table; coarsen the time " +
        "unit or raise maxTableRows")
    // sequential product per group in ascending t — the oracle's
    // windowed product() order, so the doubles are bit-identical
    val rows = steps.orderBy(col("g"), col("t")).collect()
    var curG: Any = null
    var s = 1.0
    val out = rows.map { r =>
      val g = r.get(0)
      if (g != curG) { curG = g; s = 1.0 }
      val nRisk = r.getLong(2); val d = r.getLong(3)
      s *= (1.0 - d.toDouble / nRisk.toDouble)
      (g, r.getLong(1), nRisk, d,
        BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import spark.implicits._
    val schema = counts.select(col("g")).schema.head.dataType
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq.map(t =>
        org.apache.spark.sql.Row(t._1, t._2, t._3, t._4, t._5)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(groupCol, schema),
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_risk",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("d",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("survival",
          org.apache.spark.sql.types.DoubleType))))
  }

  /** Two-sample LOG-RANK test: does group A's survival differ from
    * group B's? O − E and the hypergeometric variance summed over
    * pooled event times (Mantel 1966): at each pooled event time t,
    * E_A(t) = n_A·d/n and
    * V_A(t) = d·n_A·n_B·(n − d) / (n²·(n − 1)).
    *
    * FULLY DISTRIBUTED exact algebra — no driver fold: both per-term
    * rationals are FLOORED AT PPM as single exact integral divisions
    * (n_A·d·10⁶ DIV n and d·n_A·n_B·(n−d)·10⁶ DIV (n²·(n−1)),
    * DECIMAL(38,0) products, Decimal.quot semantics == the oracle's
    * HUGEINT //), so the sums are exact integer aggregates in ANY
    * order — the deterministic-statistic trade: ≤ 1 ppm floor error
    * per event time, identical in every engine, instead of an
    * order-sensitive float sum. z is the ONE double formula at the
    * end, rounded 6. The single-division form needs
    * n⁴·10⁶ ≤ 10³⁸ — REFUSED above 2×10⁸ observations (a rank test's
    * power saturates orders of magnitude earlier; sample first).
    *
    * Risk sets on the POOLED time axis come from the same
    * cumulative-count algebra as [[kaplanMeier]], with zero-count
    * filler rows for times one group doesn't hit.
    *
    * @return one row: (o_a, e_a_ppm, var_a_ppm, z)
    */
  def logRank(df: DataFrame, groupCol: String, timeCol: String,
              eventCol: String, groupA: String): DataFrame =
    logRankFromCounts(
      df.select(col(groupCol).cast("string").as("g"),
          col(timeCol).cast("long").as("t"),
          col(eventCol).cast("int").as("e"))
        .groupBy(col("g"), col("t"))
        .agg(sum(when(col("e") === 1, 1L).otherwise(0L)).as("d"),
          count(lit(1)).as("cnt")),
      groupA)

  /** [[logRank]] from a pre-aggregated (g, t, d, cnt) count table —
    * the streaming-state form (shared with [[kaplanMeierFromCounts]]).
    */
  private[graft] def logRankFromCounts(countsIn: DataFrame,
                                       groupA: String): DataFrame = {
    val counts = countsIn.localCheckpoint(true)
    val gs = counts.select(col("g")).distinct()
      .collect().map(_.get(0).toString)
    require(gs.length == 2 && gs.contains(groupA),
      s"logRank: exactly two groups required incl. '$groupA', got " +
        gs.mkString(", "))
    val nObs = counts.agg(sum(col("cnt"))).head().getLong(0)
    require(nObs <= 200000000L,
      s"logRank: $nObs observations — the exact single-division ppm " +
        "algebra needs n⁴·10⁶ ≤ 10³⁸ (≤ 2e8 obs); sample first (a " +
        "rank test's power saturates far earlier)")
    // fill the pooled axis: each group needs a (possibly zero-count)
    // row at EVERY pooled time so the cumulation yields its risk set
    // there
    val axis = counts.select(col("t")).distinct()
    val groups = counts.select(col("g")).distinct()
    val filled = axis.crossJoin(broadcast(groups))
      .join(counts, Seq("g", "t"), "left")
      .select(col("g"), col("t"),
        coalesce(col("d"), lit(0L)).as("d"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val cum = RankCorr.cumFromCounts(
      filled.select(col("g"), col("t"), col("cnt")), "t")
    val ng = counts.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val perGroup = filled.select(col("g"), col("t"), col("d"))
      .join(cum.select(col("g"), col("t"), col("below")), Seq("g", "t"))
      .join(broadcast(ng), Seq("g"))
      .select(col("g"), col("t"), col("d"),
        (col("n_g") - col("below")).cast("long").as("n_risk"))
    val byTime = perGroup
      .groupBy(col("t"))
      .agg(
        sum(when(col("g") === groupA, col("d")).otherwise(0L)).as("d_a"),
        sum(when(col("g") =!= groupA, col("d")).otherwise(0L)).as("d_b"),
        sum(when(col("g") === groupA, col("n_risk")).otherwise(0L)).as("n_a"),
        sum(when(col("g") =!= groupA, col("n_risk")).otherwise(0L)).as("n_b"))
      .filter(col("d_a") + col("d_b") > 0)
    val terms = byTime.selectExpr(
      "d_a",
      "CAST(n_a AS DECIMAL(38,0)) * (d_a + d_b) * 1000000 " +
        "DIV CAST(n_a + n_b AS DECIMAL(38,0)) AS e_ppm",
      "CASE WHEN n_a + n_b > 1 THEN " +
        "CAST(d_a + d_b AS DECIMAL(38,0)) * n_a * n_b " +
        "* (n_a + n_b - d_a - d_b) * 1000000 " +
        "DIV (CAST(n_a + n_b AS DECIMAL(38,0)) * (n_a + n_b) " +
        "* (n_a + n_b - 1)) ELSE 0 END AS v_ppm")
    val agg = terms.agg(
      sum(col("d_a")).cast("bigint").as("o_a"),
      sum(col("e_ppm")).cast("bigint").as("e_a_ppm"),
      sum(col("v_ppm")).cast("bigint").as("var_a_ppm"))
    agg.select(col("o_a"), col("e_a_ppm"), col("var_a_ppm"),
      when(col("var_a_ppm") > 0,
        round((col("o_a").cast("double")
          - col("e_a_ppm").cast("double") / lit(1000000.0)) /
          sqrt(col("var_a_ppm").cast("double") / lit(1000000.0)), 6))
        .otherwise(lit(null).cast("double")).as("z"))
  }
}

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
    val counts = countsIn.localCheckpoint(true) // cumulation + totals
    // n_risk(t) = N_g − #{time < t}: within-group cumulative counts;
    // the event count d CARRIES through the fused cumulation (r16 —
    // no (g, t) join-back)
    val cum = RankCorr.cumFromCountsWith(
      counts.select(col("g"), col("t"), col("cnt"), col("d")), "t",
      None, Seq("d"))
    val ng = counts.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val steps = cum
      .join(broadcast(ng), Seq("g"))
      .filter(col("d") > 0)
      .select(col("g"), col("t"), (col("n_g") - col("below"))
        .cast("bigint").as("n_risk"), col("d").cast("bigint").as("d"))
    // sequential product per group in ascending t — the oracle's
    // windowed product() order, so the doubles are bit-identical.
    // The size refusal rides the SAME action (r16 — previously its
    // own count() job): sort+limit(cap+1) plans as the
    // TakeOrderedAndProject partial+final heap, the driver holds at
    // most cap+1 rows, and one extra row proves the violation.
    val capPlus = (maxTableRows.min(Int.MaxValue - 1L) + 1).toInt
    val rows = steps.orderBy(col("g"), col("t")).limit(capPlus).collect()
    require(rows.length <= maxTableRows,
      s"kaplanMeier: more than maxTableRows=$maxTableRows " +
        "group×event-time rows — the curve IS this table; coarsen " +
        "the time unit or raise maxTableRows")
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

  /** NELSON–AALEN cumulative-hazard estimator (Nelson 1972, Aalen
    * 1978) — Ĥ(t) = Σ_{t_i ≤ t} d_i/n_i, the hazard-scale companion
    * of [[kaplanMeier]] (exp(−Ĥ) ≈ Ŝ; the hazard INCREMENTS are what
    * rate models consume). Unlike KM's inherently sequential product,
    * the hazard is a SUM — so it goes FULLY DISTRIBUTED exact: each
    * increment enters as ⌊d·10⁶/n⌋ (the q152 ppm discipline, ≤ 1 ppm
    * floor per event time, identical in both engines), and the
    * cumulation over event times is the same shared
    * [[RankCorr.cumFromCounts]] prefix machinery the risk sets ride —
    * value-cardinality, never a row-scale window, no driver fold, no
    * collect cap.
    *
    * @return one row per (group, EVENT time): (groupCol, t, n_risk,
    *         d, h_ppm, cumhaz_ppm, cumhaz) ordered by (group, t)
    */
  def nelsonAalen(df: DataFrame, groupCol: String, timeCol: String,
                  eventCol: String): DataFrame =
    nelsonAalenFromCounts(
      df.select(col(groupCol).as("g"),
          col(timeCol).cast("long").as("t"),
          col(eventCol).cast("int").as("e"))
        .groupBy(col("g"), col("t"))
        .agg(sum(when(col("e") === 1, 1L).otherwise(0L)).as("d"),
          count(lit(1)).as("cnt")),
      groupCol)

  /** [[nelsonAalen]] from a pre-aggregated (g, t, d, cnt) count table
    * (the [[graft.streaming.StreamSurvival]] state form).
    */
  private[graft] def nelsonAalenFromCounts(countsIn: DataFrame,
                                           groupCol: String): DataFrame = {
    val counts = countsIn.localCheckpoint(true) // risk cum + totals
    // both cumulation passes CARRY their payload (r16): the first
    // carries the event count d, the second carries n_risk/d/h_ppm —
    // the two (g, t) join-backs are gone
    val cum = RankCorr.cumFromCountsWith(
      counts.select(col("g"), col("t"), col("cnt"), col("d")), "t",
      None, Seq("d"))
    val ng = counts.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val steps = cum
      .join(broadcast(ng), Seq("g"))
      .filter(col("d") > 0)
      .select(col("g"), col("t"),
        (col("n_g") - col("below")).cast("long").as("n_risk"),
        col("d").cast("long").as("d"))
      .withColumn("h_ppm", expr(
        "CAST(d AS DECIMAL(38,0)) * 1000000 DIV CAST(n_risk AS DECIMAL(38,0))"))
    // cumulative hazard: the SAME prefix machinery, summing h_ppm
    RankCorr.cumFromCountsWith(
        steps.select(col("g"), col("t"), col("h_ppm").as("cnt"),
          col("n_risk"), col("d"), col("h_ppm")), "t",
        None, Seq("n_risk", "d", "h_ppm"))
      .select(col("g").as(groupCol), col("t"), col("n_risk"), col("d"),
        col("h_ppm").cast("bigint").as("h_ppm"),
        (col("below") + col("cnt")).cast("bigint").as("cumhaz_ppm"),
        round((col("below") + col("cnt")).cast("double") / lit(1000000.0), 6)
          .as("cumhaz"))
      .orderBy(col(groupCol), col("t"))
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
    // ONE group-cardinality collect serves BOTH preconditions (r16 —
    // the observation total previously paid its own agg action): the
    // two-group shape and the magnitude cap
    val gRows = counts.groupBy(col("g"))
      .agg(sum(col("cnt")).as("__n")).collect()
    val gs = gRows.map(_.get(0).toString)
    require(gs.length == 2 && gs.contains(groupA),
      s"logRank: exactly two groups required incl. '$groupA', got " +
        gs.mkString(", "))
    // strictly below 2e8: balanced margins put the variance numerator
    // at (n/2)⁴·10⁶ = exactly 10³⁸ when n = 2e8 — past DECIMAL(38,0)
    // max, so an at-the-boundary input would overflow to NULL and be
    // silently dropped by SUM
    val nObs = gRows.map(_.getLong(1)).sum
    require(nObs <= 190000000L,
      s"logRank: $nObs observations — the exact single-division ppm " +
        "algebra needs (n/2)⁴·10⁶ < 10³⁸ (≤ 1.9e8 obs); sample first " +
        "(a rank test's power saturates far earlier)")
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
    // d CARRIES through the fused cumulation (r16 — no (g, t)
    // join-back; filled is consumed exactly once)
    val cum = RankCorr.cumFromCountsWith(
      filled.select(col("g"), col("t"), col("cnt"), col("d")), "t",
      None, Seq("d"))
    val ng = counts.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val perGroup = cum
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

  /** COX PROPORTIONAL-HAZARDS regression (Cox 1972, Breslow tie
    * handling) — the multivariate member of this family: hazard
    * ratios for SEVERAL covariates at once, where [[kaplanMeier]]
    * describes one grouping and [[logRank]] tests exactly two.
    *
    * SCALE SHAPE: the partial likelihood depends on the data ONLY
    * through the (time, covariate-cell) SUFFICIENT table — per
    * distinct (t, x⃗): at-risk count n and event count d — because
    * exp(βᵀx) is constant within a cell and risk sets are suffix
    * sums over the time axis. ONE distributed aggregation builds it
    * (cell-cardinality: |times| × |covariate combos|, the count-table
    * discipline); ALL Newton iterations then run on the driver over
    * that model-sized table (named-cap refusal) — no per-iteration
    * corpus pass, and bit-deterministic: cells are folded in sorted
    * (t desc, x⃗) order, a FIXED `iters` Newton steps (no float
    * convergence test to flip across partitionings).
    *
    * Inference: U(β) = Σ_event times [Σ_events x⃗ − d·S1/S0] and
    * I(β) = Σ d·(S2/S0 − S1S1ᵀ/S0²) with S_k(t) = Σ_{risk ≥ t}
    * n·w·x^k; β ← β + I⁻¹U; SE from the inverse information at the
    * final β. At β = 0 with a single binary covariate and no ties,
    * the score test U²/I is EXACTLY the log-rank chi-square — the
    * spec's cross-operator identity.
    *
    * @param xCols 1–4 numeric covariates (bounded cell cardinality —
    *              dummy-code categories, bucket continuous values)
    * @return one row per covariate: (covariate, beta, hr, se, z) —
    *         beta/hr/se rounded 9, z rounded 6
    */
  def coxPh(df: DataFrame, timeCol: String, eventCol: String,
            xCols: Seq[String], iters: Int = 8,
            maxCells: Long = 200000L): DataFrame = {
    val (spark, cells, p) = coxCells(df, timeCol, eventCol, xCols, maxCells)
    var beta = Array.fill(p)(0.0)
    for (_ <- 0 until iters) {
      val (u, info) = coxScoreInfo(cells, beta)
      val delta = coxSolve(info, u, xCols)
      var k = 0
      while (k < p) { beta(k) += delta(k); k += 1 }
    }
    val (_, infoF) = coxScoreInfo(cells, beta)
    val inv = coxInvert(infoF, xCols)
    val rows = xCols.indices.map { k =>
      val se = math.sqrt(inv(k)(k))
      org.apache.spark.sql.Row(xCols(k),
        BigDecimal(beta(k)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        BigDecimal(math.exp(beta(k)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(se).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        BigDecimal(beta(k) / se)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("covariate", StringType),
        StructField("beta", DoubleType), StructField("hr", DoubleType),
        StructField("se", DoubleType), StructField("z", DoubleType))))
  }

  /** Score and information at a given β — exposed for the
    * score-test == log-rank spec identity.
    */
  private[graft] def coxScoreAt(df: DataFrame, timeCol: String,
                                eventCol: String, xCols: Seq[String],
                                beta: Array[Double])
      : (Array[Double], Array[Array[Double]]) = {
    val (_, cells, _) = coxCells(df, timeCol, eventCol, xCols, 200000L)
    coxScoreInfo(cells, beta)
  }

  /** The sufficient cell table, collected sorted (t desc, x⃗ asc):
    * (t, x⃗, n, d) per distinct (time, covariate vector).
    */
  private def coxCells(df: DataFrame, timeCol: String, eventCol: String,
                       xCols: Seq[String], maxCells: Long)
      : (SparkSession, Array[(Long, Array[Double], Long, Long)], Int) = {
    val p = xCols.length
    require(p >= 1 && p <= 4,
      s"coxPh: 1-4 covariates supported, got $p")
    val spark = df.sparkSession
    val sel = col(timeCol).cast("long").as("__t") +:
      col(eventCol).cast("int").as("__e") +:
      xCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"__x$i") }
    val cellDf = df.select(sel: _*)
      .groupBy((col("__t") +: xCols.indices.map(i => col(s"__x$i"))): _*)
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(when(col("__e") === 1, 1L).otherwise(0L)).cast("long").as("__d"))
    // the cap rides the COLLECT itself (r17 — previously its own
    // count() action): limit(maxCells+1) bounds driver memory to the
    // cap regardless of the true cell count (CollectLimit scans
    // incrementally), and exactly maxCells+1 rows back means the
    // table is over the cap — at or under it, the limit is a no-op
    // and the collect is complete
    val lim = math.min(maxCells + 1, Int.MaxValue.toLong).toInt
    val capped = cellDf.limit(lim).collect()
    require(capped.length <= maxCells,
      s"coxPh: more than maxCells=$maxCells (time × covariate-cell) " +
        "rows — bucket the covariates or coarsen the time unit")
    val collected = capped.map { r =>
      (r.getLong(0),
        Array.tabulate(p)(i => r.getDouble(1 + i)),
        r.getLong(1 + p), r.getLong(2 + p))
    }
    // sorted fold order: t DESCENDING (risk sets accumulate), cells
    // within a time in ascending x⃗ — bit-deterministic
    val ord = collected.sortBy { case (t, x, _, _) =>
      (-t, x.mkString(","))
    }
    (spark, ord, p)
  }

  /** One pass over the sorted cell table: (U, I) at β (Breslow). */
  private def coxScoreInfo(cells: Array[(Long, Array[Double], Long, Long)],
                           beta: Array[Double])
      : (Array[Double], Array[Array[Double]]) = {
    val p = beta.length
    var s0 = 0.0
    val s1 = Array.fill(p)(0.0)
    val s2 = Array.fill(p, p)(0.0)
    val u = Array.fill(p)(0.0)
    val info = Array.fill(p, p)(0.0)
    var i = 0
    while (i < cells.length) {
      val t = cells(i)._1
      var j = i
      var dT = 0L
      val zx = Array.fill(p)(0.0)
      while (j < cells.length && cells(j)._1 == t) {
        val (_, x, n, d) = cells(j)
        var dot = 0.0
        var k = 0
        while (k < p) { dot += beta(k) * x(k); k += 1 }
        val w = math.exp(dot)
        s0 += n * w
        k = 0
        while (k < p) {
          s1(k) += n * w * x(k)
          var l = 0
          while (l < p) { s2(k)(l) += n * w * x(k) * x(l); l += 1 }
          k += 1
        }
        dT += d
        k = 0
        while (k < p) { zx(k) += d * x(k); k += 1 }
        j += 1
      }
      if (dT > 0) {
        var k = 0
        while (k < p) {
          u(k) += zx(k) - dT * s1(k) / s0
          var l = 0
          while (l < p) {
            info(k)(l) += dT * (s2(k)(l) / s0 - s1(k) * s1(l) / (s0 * s0))
            l += 1
          }
          k += 1
        }
      }
      i = j
    }
    (u, info)
  }

  /** Solve I·δ = u (partial-pivot Gaussian elimination, p ≤ 4). */
  private def coxSolve(infoIn: Array[Array[Double]], uIn: Array[Double],
                       xCols: Seq[String]): Array[Double] = {
    val p = uIn.length
    val a = infoIn.map(_.clone())
    val b = uIn.clone()
    var c = 0
    while (c < p) {
      var piv = c
      var r = c + 1
      while (r < p) {
        if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r; r += 1
      }
      require(math.abs(a(piv)(c)) > 1e-12,
        s"coxPh: singular information matrix — covariate " +
          s"'${xCols(c)}' is constant or collinear on the risk sets")
      val tmp = a(c); a(c) = a(piv); a(piv) = tmp
      val tb = b(c); b(c) = b(piv); b(piv) = tb
      r = c + 1
      while (r < p) {
        val f = a(r)(c) / a(c)(c)
        var k = c
        while (k < p) { a(r)(k) -= f * a(c)(k); k += 1 }
        b(r) -= f * b(c)
        r += 1
      }
      c += 1
    }
    val x = Array.fill(p)(0.0)
    c = p - 1
    while (c >= 0) {
      var s = b(c)
      var k = c + 1
      while (k < p) { s -= a(c)(k) * x(k); k += 1 }
      x(c) = s / a(c)(c)
      c -= 1
    }
    x
  }

  /** Invert I via p solves against unit vectors. */
  private def coxInvert(info: Array[Array[Double]],
                        xCols: Seq[String]): Array[Array[Double]] = {
    val p = info.length
    val cols = (0 until p).map { j =>
      coxSolve(info, Array.tabulate(p)(i => if (i == j) 1.0 else 0.0),
        xCols)
    }
    Array.tabulate(p, p)((i, j) => cols(j)(i))
  }
}

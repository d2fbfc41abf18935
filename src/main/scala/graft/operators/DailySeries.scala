package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Readouts over a DAILY-AGGREGATE series (day, rev) — the shared
  * math behind the q139 autocorrelation and q140 rolling-median
  * contract queries AND their streaming twin
  * ([[graft.streaming.StreamDailySeries]] holds the daily sums as
  * state and calls exactly these, so stream == batch by
  * construction). The daily table is date-cardinality (grows with
  * time, not data volume), so every join here is broadcastable at
  * any corpus scale.
  */
object DailySeries {

  /** Autocorrelation at lags 1..maxLag — Pearson over (day, day+k)
    * pairs: exact DECIMAL(38,0) sums, ONE double division rounded 6
    * (the q137 formula). Input (day: date, rev: integral).
    */
  def acf(dailyIn: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = dailyIn
      .select(col("day"), col("rev").cast("decimal(19,0)").as("rev"))
      .localCheckpoint(true) // reused by all lag joins
    val acfs = (1 to maxLag).map { k =>
      val b = daily.select(col("day").as("day_b"), col("rev").as("rev_b"))
      val agg = daily.join(b, date_add(col("day"), k) === col("day_b"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("rev")).cast("decimal(19,0)").as("sx"),
          sum(col("rev_b")).cast("decimal(19,0)").as("sy"),
          sum(col("rev") * col("rev_b")).cast("decimal(38,0)").as("sxy"),
          sum(col("rev") * col("rev")).cast("decimal(38,0)").as("sxx"),
          sum(col("rev_b") * col("rev_b")).cast("decimal(38,0)").as("syy"))
      val n = col("n").cast("decimal(10,0)")
      val num = (n * col("sxy") - col("sx") * col("sy")).cast("decimal(38,0)")
      val varx = (n * col("sxx") - col("sx") * col("sx")).cast("decimal(38,0)")
      val vary = (n * col("syy") - col("sy") * col("sy")).cast("decimal(38,0)")
      agg.select(lit(k).as("lag"), col("n").as("n_pairs"),
        when(varx > 0 && vary > 0,
          round(num.cast("double") /
            sqrt(varx.cast("double") * vary.cast("double")), 6))
          .otherwise(lit(null).cast("double")).as("acf"))
    }
    acfs.reduce(_ unionByName _).orderBy(col("lag"))
  }

  /** Centered rolling median over a ±`halfWindow`-day window BY DATE
    * VALUE (calendar gaps shrink the window honestly); median kept
    * DOUBLED (lo+hi order statistics) — exact integers.
    */
  def rollingMedian(dailyIn: DataFrame, halfWindow: Int = 3): DataFrame = {
    val daily = dailyIn
      .select(col("day"), col("rev").cast("long").as("rev"))
      .localCheckpoint(true) // both sides of the range self-join
    val b = daily.select(col("day").as("day_b"), col("rev").as("rev_b"))
    daily.join(b, col("day_b").between(
        date_sub(col("day"), halfWindow), date_add(col("day"), halfWindow)))
      .groupBy(col("day"))
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        array_sort(collect_list(col("rev_b"))).as("w"))
      .select(col("day"), col("n_days"),
        (element_at(col("w"), expr("CAST((n_days + 1) DIV 2 AS INT)")) +
          element_at(col("w"), expr("CAST((n_days + 2) DIV 2 AS INT)")))
          .cast("bigint").as("med2_cents"))
      .orderBy(col("day"))
  }

  /** DAY-OF-WEEK SEASONAL PROFILE (classical-decomposition seasonal
    * summary, Persons 1919 ratio-to-moving-average family in its
    * additive form): detrend each day against its centered 7-day
    * moving mass, then average the detrended values per weekday —
    * "how much does a Monday differ from trend?".
    *
    * EXACT until the last step: the centered window mass tsum =
    * Σ_{±3 days BY DATE} rev is an exact integer off a range
    * self-join (the [[rollingMedian]] shape); the detrended value
    * enters SCALED BY 7 — d7 = 7·rev − tsum, an exact integer, no
    * per-day division; only FULL windows participate (edge days
    * have no centered trend — standard practice, stated); weekday =
    * (day − 1970-01-05) mod 7 (0 = Monday — an explicit formula
    * because engines disagree on dayofweek numbering). The per-
    * weekday mean is ONE double division of two exact integers
    * (sum_d7 may be negative — a floor would diverge between
    * engines' DIV semantics, so no ppm scaling here), in dollars
    * rounded 4.
    *
    * @return 7 rows: (dow, n_days, sum_d7, seasonal_dollars)
    */
  def weekdayProfile(dailyIn: DataFrame): DataFrame = {
    val daily = dailyIn
      .select(col("day").cast("date").as("day"),
        col("rev").cast("long").as("rev"))
      .localCheckpoint(true) // both sides of the range self-join
    val b = daily.select(col("day").as("day_b"), col("rev").as("rev_b"))
    daily.join(b, col("day_b").between(
        date_sub(col("day"), 3), date_add(col("day"), 3)))
      .groupBy(col("day"), col("rev"))
      .agg(count(lit(1)).as("tdays"), sum(col("rev_b")).as("tsum"))
      .filter(col("tdays") === 7)
      .select(
        (datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-05")))
          % 7).as("dow"),
        (col("rev") * 7 - col("tsum")).as("d7"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        sum(col("d7")).cast("bigint").as("sum_d7"))
      .withColumn("seasonal_dollars",
        round(col("sum_d7").cast("double") /
          (lit(700.0) * col("n_days").cast("double")), 4))
      .orderBy(col("dow"))
  }

  /** HOLT'S LINEAR-TREND exponential smoothing (Holt 1957) over the
    * daily series — the forecasting baseline above seasonal-naive
    * (q133's backtest target): level ℓ_t = α·x_t + (1−α)(ℓ + b),
    * trend b_t = β(ℓ_t − ℓ) + (1−β)b, one-step fit = ℓ + b BEFORE
    * seeing x_t, plus an h-step forecast fan ℓ_T + h·b_T past the
    * last observed day. β = 0 degrades to simple exponential
    * smoothing exactly.
    *
    * The recursion is inherently SEQUENTIAL in float — so it runs on
    * the DRIVER over the collected series in ascending-day order
    * (bit-deterministic under any partitioning) — and the series is
    * DATE-cardinality: it grows with calendar time, never with data
    * volume (the [[acf]]/[[rollingMedian]] scale story), under a
    * named-cap refusal. Init: ℓ = x_0, b = x_1 − x_0 (the standard
    * two-point start); calendar gaps are treated as consecutive
    * observations (the daily revenue table is gap-free in practice;
    * interpolate first if yours isn't).
    *
    * @return per observed day from index 1: (day, actual, fit,
    *         level, trend, is_forecast=false), then `horizon`
    *         forecast rows (actual null, is_forecast=true); fit /
    *         level / trend rounded to 6
    */
  def holt(dailyIn: DataFrame, alpha: Double = 0.2, beta: Double = 0.1,
           horizon: Int = 7, maxDays: Long = 200000L): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"holt: need 0 < alpha <= 1 and 0 <= beta <= 1, got $alpha, $beta")
    val spark = dailyIn.sparkSession
    val daily = dailyIn.select(col("day").cast("date").as("day"),
      col("rev").cast("long").as("rev"))
    val nDays = daily.count()
    require(nDays >= 2 && nDays <= maxDays,
      s"holt: $nDays days — need 2 <= days <= maxDays=$maxDays (the " +
        "series is the collected state; coarsen the time unit)")
    val series = daily.orderBy(col("day")).collect()
      .map(r => (r.getDate(0), r.getLong(1)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var level = series(0)._2.toDouble
    var trend = series(1)._2.toDouble - series(0)._2.toDouble
    val fitted = series.drop(1).map { case (day, x) =>
      val fit = level + trend
      val newLevel = alpha * x + (1.0 - alpha) * (level + trend)
      trend = beta * (newLevel - level) + (1.0 - beta) * trend
      level = newLevel
      org.apache.spark.sql.Row(day, java.lang.Long.valueOf(x), r6(fit),
        r6(level), r6(trend), false)
    }
    val lastDay = series.last._1.toLocalDate
    val forecasts = (1 to horizon).map { h =>
      org.apache.spark.sql.Row(java.sql.Date.valueOf(lastDay.plusDays(h)),
        null, r6(level + h * trend), r6(level), r6(trend), true)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize((fitted ++ forecasts).toSeq, 1),
      StructType(Seq(StructField("day", DateType),
        StructField("actual_cents", LongType),
        StructField("fit", DoubleType), StructField("level", DoubleType),
        StructField("trend", DoubleType),
        StructField("is_forecast", BooleanType))))
  }

  /** HOLT–WINTERS ADDITIVE SEASONAL smoothing (Winters 1960) with a
    * weekly (period-7) cycle — the top of the forecasting ladder
    * q133 seasonal-naive → q162 Holt → here: level + trend + a
    * seasonal offset per weekday, each exponentially smoothed.
    *
    *   fit_t = ℓ + b + s_{t−7}            (one-step, BEFORE x_t)
    *   ℓ_t = α(x_t − s_{t−7}) + (1−α)(ℓ + b)
    *   b_t = β(ℓ_t − ℓ) + (1−β)b
    *   s_t = γ(x_t − ℓ_t) + (1−γ)s_{t−7}
    *
    * Seeds are the classical two-week start (the q166 weekday-profile
    * idea at minimal window): ℓ = mean(week 1), b = (mean(week 2) −
    * mean(week 1))/7, s_i = x_i − mean(week 1) for the first seven
    * days — so a purely 7-periodic series is a FIXED POINT (every fit
    * exact) and a constant series degrades to zero trend and zero
    * seasonals exactly. γ = 0 freezes the seeded seasonal profile;
    * γ = β = 0 with flat seeds is simple exponential smoothing.
    *
    * Same scale contract as [[holt]]: the recursion is inherently
    * sequential in float, so it folds on the DRIVER over the
    * DATE-cardinality series (grows with calendar time, never with
    * data volume) under the same named-cap refusal; the series must
    * be gap-free daily (interpolate first — [[Interpolate]]).
    *
    * @return per observed day from index 7: (day, actual_cents, fit,
    *         level, trend, seasonal [the s used by the fit],
    *         is_forecast=false), then `horizon` forecast rows
    *         ℓ_T + h·b_T + s_cyclic (actual null, is_forecast=true)
    */
  def holtWinters(dailyIn: DataFrame, alpha: Double = 0.2,
                  beta: Double = 0.1, gamma: Double = 0.1,
                  horizon: Int = 7, maxDays: Long = 200000L): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1 &&
      gamma >= 0 && gamma <= 1,
      s"holtWinters: need 0 < alpha <= 1 and 0 <= beta, gamma <= 1, " +
        s"got $alpha, $beta, $gamma")
    val spark = dailyIn.sparkSession
    val daily = dailyIn.select(col("day").cast("date").as("day"),
      col("rev").cast("long").as("rev"))
    val nDays = daily.count()
    require(nDays >= 14 && nDays <= maxDays,
      s"holtWinters: $nDays days — need 14 <= days <= maxDays=" +
        s"$maxDays (two full weekly cycles seed the seasonal state; " +
        "the series is the collected state — coarsen the time unit)")
    val series = daily.orderBy(col("day")).collect()
      .map(r => (r.getDate(0), r.getLong(1)))
    // ENFORCED gap-free contract (holt() tolerates gaps — it has no
    // periodic alignment; here one missing or duplicated day would
    // silently ROTATE every subsequent weekday's seasonal index and
    // yield wrong seasonals/fits/forecasts with no error): exact span
    // and distinctness checks on the collected series, refusing loudly
    // per the corpus convention.
    val firstD = series.head._1.toLocalDate
    val lastD = series.last._1.toLocalDate
    val span = java.time.temporal.ChronoUnit.DAYS.between(firstD, lastD) + 1
    val nDistinct = series.map(_._1).distinct.length
    require(nDistinct == series.length && span == series.length,
      s"holtWinters: series has gaps or duplicate days ($nDistinct " +
        s"distinct days over a $span-day span for ${series.length} " +
        "rows) — the t % 7 seasonal indexing needs a gap-free daily " +
        "series; interpolate first (Interpolate) and aggregate to one " +
        "row per day")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w1 = series.slice(0, 7).map(_._2.toDouble)
    val w2 = series.slice(7, 14).map(_._2.toDouble)
    val m1 = w1.sum / 7.0
    var level = m1
    var trend = (w2.sum / 7.0 - m1) / 7.0
    val seasonal = w1.map(_ - m1) // s_0..s_6, indexed t % 7 cyclically
    val fitted = series.zipWithIndex.drop(7).map { case ((day, x), t) =>
      val s = seasonal(t % 7)
      val fit = level + trend + s
      val newLevel = alpha * (x - s) + (1.0 - alpha) * (level + trend)
      trend = beta * (newLevel - level) + (1.0 - beta) * trend
      level = newLevel
      seasonal(t % 7) = gamma * (x - newLevel) + (1.0 - gamma) * s
      org.apache.spark.sql.Row(day, java.lang.Long.valueOf(x), r6(fit),
        r6(level), r6(trend), r6(s), false)
    }
    val lastDay = series.last._1.toLocalDate
    val lastT = series.length - 1
    val forecasts = (1 to horizon).map { h =>
      val s = seasonal((lastT + h) % 7)
      org.apache.spark.sql.Row(java.sql.Date.valueOf(lastDay.plusDays(h)),
        null, r6(level + h * trend + s), r6(level), r6(trend), r6(s), true)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize((fitted ++ forecasts).toSeq, 1),
      StructType(Seq(StructField("day", DateType),
        StructField("actual_cents", LongType),
        StructField("fit", DoubleType), StructField("level", DoubleType),
        StructField("trend", DoubleType),
        StructField("seasonal", DoubleType),
        StructField("is_forecast", BooleanType))))
  }
}

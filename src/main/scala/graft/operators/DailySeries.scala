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
}

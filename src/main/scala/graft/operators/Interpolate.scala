package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LINEAR-interpolation time-series gap fill — the lerp complement of
  * the LOCF resample (q35 / StreamGapFill): a missing day strictly
  * between two observations gets the straight-line value instead of
  * the carried-forward one.
  *
  * Exactness: the interpolated value is computed with integer FLOOR
  * arithmetic — `lerp = prev + (Δ·off − floormod(Δ·off, span)) / span`
  * with `floormod(a, b) = ((a % b) + b) % b` — every term a bigint, so
  * a NEGATIVE slope cannot split truncate-vs-floor between engines
  * (Spark's `div` truncates toward zero, DuckDB's `//` floors; the
  * explicit floor-mod makes both spell the same floor).
  *
  * Scale shape: the day grid comes from `sequence`+`explode` inside
  * the scan task (no driver date loop); prev/next observations are
  * carried by two IGNORE-NULLS windows PARTITIONED by key — bounded
  * state, never a global window.
  */
object Interpolate {

  /** @param daily one row per (key, day) OBSERVATION with an integral
    *        value column; days missing between a key's min and max day
    *        are emitted with the interpolated value and
    *        `interpolated = true`
    */
  def lerpFill(daily: DataFrame, keyCol: String, dayCol: String,
               valueCol: String): DataFrame = {
    val grid = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day")))
          .as(dayCol))
    val joined = grid.join(daily, Seq(keyCol, dayCol), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = w.rowsBetween(0, Window.unboundedFollowing)
    val obsDay = when(col(valueCol).isNotNull, col(dayCol))
    val withEnds = joined
      .withColumn("__pv", last(col(valueCol), ignoreNulls = true).over(wPrev))
      .withColumn("__pd", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col(valueCol), ignoreNulls = true).over(wNext))
      .withColumn("__nd", first(obsDay, ignoreNulls = true).over(wNext))
    val num = (col("__nv") - col("__pv")) *
      datediff(col(dayCol), col("__pd")).cast("long")
    val span = datediff(col("__nd"), col("__pd")).cast("long")
    val lerp = col("__pv") + (num - pmod(num, span)) / span
    withEnds.select(col(keyCol), col(dayCol),
      coalesce(col(valueCol), lerp.cast("long")).as(valueCol),
      col(valueCol).isNull.as("interpolated"))
  }
}

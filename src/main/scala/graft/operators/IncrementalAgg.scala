package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of an aggregate table: merge a delta
  * batch's PARTIAL aggregates into the existing state without
  * touching historical raw data — the materialized-view-maintenance
  * pattern. At 100 TB the nightly delta re-aggregates gigabytes, not
  * the full fact history.
  *
  * Works for any decomposable aggregate kept in sum/count form
  * (sums, counts, and anything derivable from them: mean, ratios).
  * Sums are exact decimals, so incremental == full recompute exactly
  * (oracle-checked by `q27_incremental_agg`).
  */
object IncrementalAgg {

  /** Partial-aggregate a batch: per key, `n` and decimal `s`. */
  def partial(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(38,2)").as("s"))

  /** Merge an existing state with a new batch's partials. */
  def merge(state: DataFrame, deltaPartial: DataFrame, keyCols: Seq[String]): DataFrame =
    state.unionByName(deltaPartial)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).cast("bigint").as("n"),
        sum(col("s")).cast("decimal(38,2)").as("s"))

  /** Read out the maintained aggregate with derived columns. */
  def readout(state: DataFrame, keyCols: Seq[String]): DataFrame =
    state.select(
      keyCols.map(col) ++ Seq(
        col("n"),
        col("s").cast("double").as("sum_value"),
        (col("s").cast("double") / col("n").cast("double")).as("mean_value")): _*)
}

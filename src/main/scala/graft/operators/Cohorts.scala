package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort-retention readout — the shared math behind the q142
  * contract query AND its streaming twin
  * ([[graft.streaming.StreamCohorts]] holds exactly the two
  * sufficient-statistic tables and calls this, so stream == batch by
  * construction): cohort = a user's first-activity week, cell
  * (cohort, k) = distinct users active k weeks later / cohort size.
  * Offsets by integer day-difference DIV 7 (months_between has float
  * semantics); counts exact, retention the ONE double division
  * rounded 6.
  *
  * @param first  (user_id, cohort: date) — first-activity week
  * @param active (user_id, am: date) — DISTINCT (user, week) activity
  */
object Cohorts {

  def retention(first: DataFrame, active: DataFrame,
                maxOffset: Int = 12): DataFrame = {
    val size = first.groupBy(col("cohort"))
      .agg(count(lit(1)).cast("bigint").as("cohort_size"))
    val cells = active.join(first, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(col("am"), col("cohort")) / 7).cast("int"))
      .filter(col("week_offset").between(0, maxOffset))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).cast("bigint").as("n_active"))
    cells.join(size, Seq("cohort"))
      .select(col("cohort"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
      .orderBy(col("cohort"), col("week_offset"))
  }
}

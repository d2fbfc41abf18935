package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key interval coalescing — merge each key's overlapping (or
  * touching-by-overlap) intervals into maximal disjoint spans,
  * summing a weight (member count by default) into each span.
  *
  * This is the operator form of the q90 islands-and-gaps algebra
  * ([[graft.queries.Advanced]]): an island boundary is a row whose
  * start lies strictly after the running maximum end among that
  * key's earlier rows (ordered by start, then end). The window is
  * PARTITIONED by key, so state per task is one key's rows — no
  * global sort, no single-task window, and the 100 TB shape is one
  * shuffle on the key.
  *
  * Coalescing is a closure operator: `coalesce(coalesce(A) ∪ B) =
  * coalesce(A ∪ B)` — each committed span is itself a valid interval
  * carrying its members' summed weight, so a maintained view can
  * fold new intervals into the (small) span state without touching
  * history. [[graft.streaming.StreamIntervalMerge]] builds on exactly
  * that identity; weights make the fold NON-idempotent under replay
  * (a re-delivered interval re-adds its weight), which is why the
  * streaming form carries a batch-id guard rather than relying on
  * algebra alone.
  */
object IntervalMerge {

  /** Coalesce `df`'s `(keyCol, startCol, endCol)` intervals into
    * maximal spans: one row per span with `span_start`, `span_end`
    * and the summed `weightCol` (pass a `lit(1L)` column via
    * `withColumn` upstream — or any per-interval weight — to count
    * members). Start/end may be any mutually comparable orderable
    * type (dates, timestamps, longs); an interval must satisfy
    * start <= end.
    */
  def coalesce(df: DataFrame, keyCol: String, startCol: String,
               endCol: String, weightCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new_island",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
          .otherwise(0L))
      .withColumn("__island",
        sum(col("__new_island"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        sum(col(weightCol)).cast("bigint").as("weight"))
      .drop("__island")
  }
}

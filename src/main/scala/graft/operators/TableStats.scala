package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-scan table profiling — the ANALYZE TABLE shape.
  *
  * Every column's (non-null count, distinct count, min, max) is
  * computed in a SINGLE aggregate over a single scan, then unpivoted
  * to one row per column with `stack` — profiling a 100 TB table
  * costs one pass, not one pass per column. Distinct counts default
  * to HLL `approx_count_distinct` (scan-local partials, constant
  * state per column); `exactNdv = true` switches to exact
  * count-distinct (Catalyst plans the multi-distinct via Expand —
  * k columns multiply the aggregate input k-fold, the documented
  * price of exactness).
  *
  * min/max are cast to string so heterogeneous column types share
  * one output schema — the same trick every stats catalog uses.
  */
object TableStats {

  def profile(df: DataFrame, cols: Seq[String],
              exactNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "TableStats.profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exactNdv) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols
      .map(c => s"'$c', `__cnt_$c`, `__ndv_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    one.select(col("__n"), expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, n_nonnull, n_distinct, min_value, max_value)"))
      .select(col("column_name"), col("__n").as("n_rows"),
        col("n_nonnull"), (col("__n") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join expressed as a bucketed equi-join.
  *
  * `probe.t BETWEEN interval.start AND interval.end` has no equality
  * key, so Spark's planner can only offer a broadcast-nested-loop or
  * cartesian product — O(|probe|·|intervals|) comparisons, a
  * non-starter at 100 TB. The standard scale rewrite (used by every
  * warehouse engine's range-join optimization, e.g. Databricks'
  * range-join hints and DuckDB's IEJoin literature) is to quantize
  * time into fixed-width buckets: each probe row lands in exactly one
  * bucket, each interval is exploded to the buckets it overlaps, and
  * the join becomes a hash equi-join on the bucket id with the exact
  * range predicate applied as a residual filter. Each matching pair
  * is produced exactly once (a probe row exists in one bucket only),
  * so no post-join dedup is needed.
  *
  * Cost: the exchange carries |probe| + Σ(interval span / width)
  * rows, and comparisons are confined to co-bucketed pairs. Choose
  * `bucketSeconds` near the typical interval length: shorter buckets
  * explode intervals wider; longer buckets admit more non-matching
  * residual pairs. Skewed buckets (a hot time window) are split by
  * AQE skew-join like any other hot key.
  *
  * The reference engine has no interval operator; this is part of the
  * §2b relational surface a warehouse replacement needs (SURVEY.md
  * row 33m).
  */
object RangeJoin {

  private val Bin = "__graft_range_bin"

  /** Join `probe` rows to every `intervals` row whose
    * `[startCol, endCol)` half-open window contains `probeTime`.
    * Output columns are probe's then intervals'; the two schemas must
    * be name-disjoint (callers project/alias first, as with any
    * natural join). Empty or inverted intervals match nothing.
    *
    * An interval spanning far more than `bucketSeconds` explodes to
    * one row per overlapped bucket — a single year-long interval at
    * 1-second buckets is a 31M-element `sequence` in one row. Size
    * `bucketSeconds` to the typical interval (outliers are then a few
    * extra rows, not millions); `maxBucketsPerInterval` fails fast
    * with a clear message instead of letting a malformed end date
    * OOM an executor mid-job.
    */
  /** With `spreadProbe`, the binned probe is hash-repartitioned on
    * the bucket id before the join. Pair generation parallelism is
    * otherwise bound to the probe's scan splits — the right default
    * at scale (no extra exchange), but a probe read from few splits
    * (a compacted single file, a small filtered table) funnels the
    * entire candidate fan-out through those few tasks; one narrow
    * exchange of (time, bin) rows then buys full-cluster fan-out.
    * `spreadIntervals` is the symmetric knob for the interval side:
    * an intervals table read from few splits funnels the POST-explode
    * fan-out (spans / width rows per interval) through those same
    * tasks; repartitioning on the bucket id after the explode spreads
    * the exploded rows cluster-wide.
    */
  def intervalJoin(
      probe: DataFrame,
      probeTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketSeconds: Long,
      spreadProbe: Boolean = false,
      spreadIntervals: Boolean = false,
      maxBucketsPerInterval: Int = 65536): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    // Binning epoch is type-dependent (see `us` below): NTZ maps wall
    // clock as-if-UTC, LTZ maps the instant through the session TZ.
    // A probe/interval mix of the two would bin on different epochs
    // under a non-UTC session TZ and silently drop boundary matches —
    // and the residual NTZ-vs-LTZ comparison itself would hinge on an
    // implicit session-TZ coercion. Reject the mix outright.
    val ntzness = Seq(
      probeTime -> probe.schema(probeTime).dataType,
      startCol -> intervals.schema(startCol).dataType,
      endCol -> intervals.schema(endCol).dataType
    ).map { case (n, t) =>
      n -> (t == org.apache.spark.sql.types.TimestampNTZType)
    }
    require(ntzness.map(_._2).distinct.size == 1,
      s"RangeJoin: probe/interval time columns mix TIMESTAMP_NTZ with " +
        s"session-TZ timestamps (${ntzness.map { case (n, z) =>
          s"$n=${if (z) "NTZ" else "LTZ"}" }.mkString(", ")}); cast them " +
        "to one timestamp family first")
    val width = bucketSeconds * 1000000L // micros
    // Epoch micros for binning. TIMESTAMP_NTZ must NOT go through a
    // session-TZ cast: with a DST zone the offset varies by instant,
    // so two distinct NTZ values inside a spring-forward gap would
    // collapse to the same epoch and a probe on an exact bucket
    // boundary could miss its interval. Instead the NTZ wall clock is
    // mapped to micros as if UTC — date and time-of-day fields are
    // TZ-independent on NTZ, so the mapping is strictly monotone in
    // the value, which is all binning needs. The exact range check
    // below still compares the original untouched columns.
    def us(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_date(col(c).cast("date")).cast("long") * lit(86400000000L) +
          hour(col(c)).cast("long") * lit(3600000000L) +
          minute(col(c)).cast("long") * lit(60000000L) +
          (date_part(lit("SECOND"), col(c)) * lit(1000000L)).cast("long")
      case _ => unix_micros(col(c).cast("timestamp_ltz"))
    }
    val binned = probe.withColumn(Bin, floor(us(probe, probeTime) / width))
    val p = if (spreadProbe) binned.repartition(col(Bin)) else binned
    val startBin = floor(us(intervals, startCol) / width)
    // end is exclusive: the bucket of the last contained instant
    val endBin = floor((us(intervals, endCol) - 1) / width)
    // fail fast (with the knob to turn) instead of materializing a
    // multi-million-element sequence in one row
    val endChecked = when(endBin - startBin < lit(maxBucketsPerInterval.toLong),
      endBin).otherwise(raise_error(format_string(
        s"RangeJoin: interval spans %s buckets at bucketSeconds=$bucketSeconds " +
          s"(max $maxBucketsPerInterval) — raise bucketSeconds, raise " +
          "maxBucketsPerInterval, or repair the interval bounds",
        endBin - startBin + 1)).cast("long"))
    val exploded = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn(Bin, explode(sequence(startBin, endChecked)))
    val iv = if (spreadIntervals) exploded.repartition(col(Bin)) else exploded
    p.join(iv, Seq(Bin))
      .filter(col(probeTime) >= col(startCol) && col(probeTime) < col(endCol))
      .drop(Bin)
  }
}

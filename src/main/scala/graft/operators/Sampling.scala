package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset sampling and splitting for training pipelines.
  *
  * Both operators are fully deterministic and row-parallel:
  *  - `hashSplit` assigns each row to a split by hashing a stable id
  *    — reproducible across runs, machines, and table re-orderings
  *    (unlike `randomSplit`, which depends on partitioning), and any
  *    row's split can be recomputed independently (joins between
  *    split artifacts stay consistent);
  *  - `stratifiedSample` keeps an approximate per-stratum fraction
  *    using the same hash trick, so no per-stratum pass or state.
  */
object Sampling {

  private val Buckets = 1000000L

  private def bucket(idCol: Column, salt: String): Column =
    pmod(xxhash64(idCol, lit(salt)), lit(Buckets))

  /** Deterministic train/test split: (train, test) with ~`testFraction`
    * of rows in test, assigned by id hash.
    */
  def hashSplit(df: DataFrame, idCol: String, testFraction: Double,
                salt: String = "split"): (DataFrame, DataFrame) = {
    require(testFraction > 0 && testFraction < 1, "testFraction must be in (0,1)")
    val cut = (testFraction * Buckets).toLong
    val b = bucket(col(idCol), salt)
    (df.filter(b >= cut), df.filter(b < cut))
  }

  /** Engine-portable deterministic bucket: first 8 hex digits of
    * md5(id-as-string) mod `buckets`. Slower than the xxhash64 bucket
    * but recomputable bit-for-bit in any engine (the DuckDB oracle
    * recomputes it for `text_sample_det`), so a sample drawn here can
    * be reproduced by external tooling.
    */
  def portableBucket(idCol: Column, buckets: Long = 100L): Column =
    conv(substring(md5(idCol.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Deterministic `percent`% sample by portable bucket. */
  def portableSample(df: DataFrame, idCol: String, percent: Int): DataFrame =
    df.filter(portableBucket(col(idCol)) < percent)

  /** Deterministic stratified sample: keep ~`fractions(stratum)` of
    * each stratum (default fraction for unlisted strata).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       salt: String = "strata"): DataFrame = {
    val cutExpr = fractions.foldLeft(lit((defaultFraction * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), salt) < cutExpr)
  }

  /** EXACT deterministic stratified sample: exactly
    * `floor(fraction * |stratum|)` rows from every stratum — the
    * training-data-mix contract where a 10% slice must be 10% of
    * EVERY language/source, not 10% in expectation. Rows are chosen
    * by engine-portable hash order ([[portableBucket]], ties by id),
    * so the selection is reproducible bit-for-bit by external tooling
    * and stable under re-partitioning. Costs one shuffle + per-group
    * sort (a window over the stratum) — exact quotas are inherently a
    * per-group rank; use [[stratifiedSample]] when approximate
    * fractions are acceptable at scan speed.
    */
  def stratifiedSampleExact(df: DataFrame, idCol: String, stratumCol: String,
                            fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0,1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(portableBucket(col(idCol)), col(idCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__quota", floor(count(lit(1)).over(wAll) * fraction).cast("bigint"))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Per-group document CAP — the domain-balancing primitive of
    * web-corpus pipelines: keep at most `n` rows from every group
    * (source/domain/shard), chosen in engine-portable hash order
    * ([[portableBucket]], ties by id) so the kept set is reproducible
    * bit-for-bit and stable under re-partitioning. Unlike the quota
    * sampler's per-group window sort, the cap runs through the
    * TopKPerKey heap exec: partial per-partition heaps bound memory
    * and the exchange carries at most |partitions| x |groups| x n
    * rows — a hot domain with a billion documents never sorts, it
    * heap-selects.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  n: Int): DataFrame = {
    require(n > 0, "cap must be positive")
    val withBucket = df.withColumn("__pb", portableBucket(col(idCol)))
    org.apache.spark.sql.graft.TopKPerKey(withBucket, Seq(groupCol),
      Seq("__pb" -> false, idCol -> false), n).drop("__pb")
  }

  /** Deterministic weighted sample WITHOUT replacement
    * (Efraimidis–Spirakis A-ES): each row draws an exponential with
    * rate = its weight from a hash-derived uniform, and the `k`
    * smallest draws win — selection probability is proportional to
    * weight, the contract behind training-mix/domain-weighting
    * sampling. The uniform comes from md5(id, salt) (52-bit mantissa,
    * uniform in (0,1]), so the sample is reproducible across runs,
    * machines, and any re-partitioning; changing `salt` redraws.
    * Rows with non-positive weight are excluded. Plans as
    * TakeOrderedAndProject (bounded per-partition heaps + a k-row
    * driver merge), never a full sort — at 100 TB the cost is the
    * scan plus k rows per partition.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = "wsample"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(substring(md5(concat_ws("",
        col(idCol).cast("string"), lit(salt)).cast("binary")), 1, 13), 16, 10)
      .cast("double") + lit(1.0)) / lit(4503599627370496.0) // 2^52
    val key = -log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("__wkey", key)
      .orderBy(col("__wkey").asc, col(idCol).asc)
      .limit(k)
      .drop("__wkey")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-preparation operators: numeric scaling and categorical
  * encoding — the last mile between a curated corpus and a training
  * matrix.
  *
  * Exactness discipline (the q20 convention): every statistic that
  * feeds a float formula is first computed EXACTLY (integer min/max/
  * counts, DECIMAL sums), and doubles appear only in a final, fixed
  * sequence of IEEE operations. That makes every output reproducible
  * bit-for-bit across engines, partitionings and retries — a scaled
  * feature that drifts with partition order would silently break
  * training reproducibility.
  *
  * Scale shape: one hash aggregation over the group column computes
  * all statistics in a single pass (partial aggregation map-side);
  * the per-group statistics table is model-sized and broadcast back.
  * No window over the full table, no second scan.
  */
object FeatureEncoding {

  /** Per-`groupCol` scaling of integral `valueCol`: appends
    *  - `minmax`  = (x - min) / (max - min)   (0 when max == min),
    *  - `zscore`  = (x - mean) / stddev       (sample stddev; null
    *                                           when n < 2 or flat),
    * with mean/stddev derived from exact DECIMAL sums.
    */
  def scaleNumeric(df: DataFrame, groupCol: String, valueCol: String)
  : DataFrame = {
    val v = col(valueCol).cast("decimal(18,2)")
    val stats = df.groupBy(col(groupCol)).agg(
      min(col(valueCol)).cast("long").as("__mn"),
      max(col(valueCol)).cast("long").as("__mx"),
      count(lit(1)).cast("bigint").as("__n"),
      sum(v).cast("double").as("__sx"),
      sum((v * v).cast("decimal(38,4)")).cast("double").as("__sxx"))
    val x = col(valueCol).cast("double")
    val mean = col("__sx") / col("__n").cast("double")
    val variance = (col("__sxx") - col("__sx") * col("__sx") /
      col("__n").cast("double")) / (col("__n") - 1).cast("double")
    df.join(broadcast(stats), Seq(groupCol))
      .withColumn("minmax",
        when(col("__mx") === col("__mn"), lit(0.0))
          .otherwise((col(valueCol) - col("__mn")).cast("double") /
            (col("__mx") - col("__mn")).cast("double")))
      .withColumn("zscore",
        when(col("__n") < 2 || variance <= 0, lit(null).cast("double"))
          .otherwise((x - mean) / sqrt(variance)))
      .drop("__mn", "__mx", "__n", "__sx", "__sxx")
  }

  /** Per-`groupCol` ROBUST scaling of integral `valueCol`: appends
    * `robust_z` = (x − median) / MAD — the outlier-immune sibling of
    * [[scaleNumeric]]'s z-score (a few huge documents shift a mean
    * and explode a stddev; they barely move a median). Exact discrete
    * medians (actual data members, integer-exact cross-engine — the
    * q68 percentile_disc parity); MAD needs a second dependent pass
    * by nature (deviations depend on the median), both passes hash
    * aggregations with model-sized stat tables broadcast back. Flat
    * groups (MAD 0) yield NULL, not NaN.
    */
  def robustScale(df: DataFrame, groupCol: String, valueCol: String)
  : DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $valueCol)")
        .cast("long").as("__med"))
    val withDev = df.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol).cast("long") - col("__med")))
    val mad = withDev.groupBy(col(groupCol))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __dev)")
        .cast("long").as("__mad"))
    withDev.join(broadcast(mad), Seq(groupCol))
      .withColumn("robust_z",
        when(col("__mad") === 0, lit(null).cast("double"))
          .otherwise((col(valueCol).cast("long") - col("__med")).cast("double") /
            col("__mad").cast("double")))
      .drop("__dev")
      .withColumnRenamed("__med", "median")
      .withColumnRenamed("__mad", "mad")
  }

  /** Per-category frequency + smoothed target encoding over an
    * integral target (cents-style): returns one row per category with
    *  - `freq`        = n_cat / n_total,
    *  - `target_mean` = sum_cat / n_cat,
    *  - `target_enc`  = (sum_cat + m * global_mean) / (n_cat + m)
    * (the m-estimate shrinkage of Micci-Barreca 2001 — rare
    * categories pull toward the global mean instead of memorizing
    * their few rows). All sums exact; doubles only in the final
    * divisions.
    */
  /** Per-group QUANTILE NORMALIZATION onto the pooled distribution —
    * the cross-source feature equalizer (microarray-style quantile
    * normalization, Bolstad '03): each row's value is replaced by the
    * pooled order statistic at its within-group relative rank, so
    * every group ends up with (a subsample of) the SAME marginal
    * distribution. The batch-effect remover for multi-source corpora:
    * scores/lengths from different crawls become comparable without
    * trusting either source's calibration.
    *
    * Exact algebra end to end: within-group rank r over (value, id),
    * group size n_g, pool size N; target pooled rank
    * k = ceil(r·N/n_g) = (r·N + n_g − 1) div n_g in DECIMAL(38,0)
    * (r·N overflows a long once N passes ~3B rows), r = n_g ⇒ k = N.
    * The normalized value is the pooled value at positional rank k —
    * an order statistic, never an interpolated percentile whose last
    * ulp could drift between engines.
    *
    * Scale shape: TWO distributed rank passes through
    * [[Ranking.globalRank]] (range partitions + driver offsets —
    * never an unpartitioned window; the within-group rank derives
    * from ONE composite-key (group, value, id) rank minus per-group
    * offsets, the q106 few-large-groups discipline), then ONE
    * equi-join of the target rank against the pooled rank table.
    * Group offsets are group-cardinality and broadcast.
    *
    * @param valueCol integral column (cast to long); scale decimals
    *        to integer units first (the cents convention)
    * @param idCol unique row id — the deterministic tiebreak
    * @return (idCol, groupCol, valueCol, qnorm)
    */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String): DataFrame = {
    val v = df.select(col(groupCol).as("__grp"),
      col(valueCol).cast("long").as("__v"), col(idCol).as("__id"))
      .localCheckpoint(true)
    val n = v.count()
    val ranked = Ranking.globalRank(v, Seq("__grp", "__v", "__id"), "__gr", 0)
    val offs = ranked.groupBy(col("__grp"))
      .agg(min(col("__gr")).as("__o"), count(lit(1)).as("__ng"))
    val pooled = Ranking.globalRank(v.select(col("__v"), col("__id")),
        Seq("__v", "__id"), "__k", 0)
      .select(col("__k").as("__tk"), col("__v").as("qnorm"))
    ranked.join(broadcast(offs), Seq("__grp"))
      .withColumn("__r", col("__gr") - col("__o") + lit(1L))
      .withColumn("__tk", expr(
        s"CAST((CAST(__r AS DECIMAL(38,0)) * ${n} + __ng - 1) DIV __ng AS BIGINT)"))
      .join(pooled, Seq("__tk"))
      .select(col("__id").as(idCol), col("__grp").as(groupCol),
        col("__v").as(valueCol), col("qnorm"))
  }

  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   m: Int = 10): DataFrame = {
    require(m >= 0, s"smoothing m must be >= 0, got $m")
    val perCat = df.groupBy(col(catCol)).agg(
      count(lit(1)).cast("bigint").as("n"),
      sum(col(targetCol).cast("decimal(18,2)")).cast("double").as("__s"))
    val totals = df.agg(
      count(lit(1)).cast("bigint").as("__nt"),
      sum(col(targetCol).cast("decimal(18,2)")).cast("double").as("__st"))
    val globalMean = col("__st") / col("__nt").cast("double")
    perCat.crossJoin(broadcast(totals))
      .withColumn("freq", col("n").cast("double") / col("__nt").cast("double"))
      .withColumn("target_mean", col("__s") / col("n").cast("double"))
      .withColumn("target_enc",
        (col("__s") + lit(m.toDouble) * globalMean) /
          (col("n") + lit(m)).cast("double"))
      .drop("__nt", "__st", "__s")
  }
}

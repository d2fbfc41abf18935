package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.plans.ZValue

/** Z-order clustered data layout — multi-dimensional file skipping.
  *
  * A 100 TB table sorted by one column prunes scans filtered on that
  * column and nothing else. Z-ordering interleaves the rank-bucket
  * bits of SEVERAL columns into one sort key ([[graft.plans.ZValue]]),
  * so each written file covers a small hyper-rectangle of the
  * dimension space and parquet footer min/max stats prune scans
  * filtered on ANY of the clustered dimensions. This is the layout
  * half of scan performance — the query half (pushdown, pruning) is
  * SURVEY §2b row 19.
  *
  * Pipeline shape at scale: one pass to sample quantile cutpoints
  * (driver state = ndims × 2^bits doubles — model-sized), one
  * range-exchange on the z-value, a within-partition sort, and the
  * write. No global sort, no driver data movement.
  */
object ZOrder {

  val ZCol = "__zvalue"

  /** Numeric view of a dimension for clustering/pruning math: DATE
    * compares in days since epoch (`unix_date` — Spark 4 rejects a
    * direct DATE→DOUBLE cast), TIMESTAMP casts to fractional epoch
    * seconds, BOOLEAN goes through int, numerics cast directly. The
    * SAME view is used when sampling cutpoints, computing z-values,
    * and probing envelopes, so the three always agree.
    */
  private[operators] def numView(
      c: Column, t: org.apache.spark.sql.types.DataType): Column = t match {
    case org.apache.spark.sql.types.DateType => unix_date(c).cast("double")
    case org.apache.spark.sql.types.BooleanType => c.cast("int").cast("double")
    case _ => c.cast("double")
  }

  /** Per-dimension quantile cutpoints: 2^bits - 1 interior quantiles
    * (equal-population buckets; duplicates from skew collapse into
    * fewer effective buckets, which only widens tiles — never wrong).
    *
    * Dimensions are projected through the SAME [[numView]] the
    * z-value uses before sampling, so timestamp/date dims — the most
    * common clustering keys — work out of the box (approxQuantile
    * itself accepts only numerics).
    */
  def cutpoints(df: DataFrame, dims: Seq[String], bits: Int,
                relErr: Double = 0.001): Seq[Array[Double]] = {
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val names = dims.indices.map(i => s"__zdim_$i")
    val cast = df.select(dims.zip(names).map { case (d, n) =>
      numView(col(d), df.schema(d).dataType).as(n)
    }: _*)
    cast.stat.approxQuantile(names.toArray, probs, relErr)
      .map(_.distinct.sorted)
      .toSeq
  }

  /** The z-value column for `dims` under the given cutpoints. */
  def zvalue(dims: Seq[Column], cuts: Seq[Array[Double]], bits: Int): Column =
    ColumnBridge.column(ZValue(
      ColumnBridge.expression(array(dims.map(_.cast("double")): _*)),
      cuts, bits))

  /** `df` with [[ZCol]] appended (cutpoints sampled from `df` itself). */
  def cluster(df: DataFrame, dims: Seq[String], bits: Int = 8): DataFrame =
    df.withColumn(ZCol,
      zvalue(dims.map(d => numView(col(d), df.schema(d).dataType)),
        cutpoints(df, dims, bits), bits))

  /** Write `df` into ~`numFiles` z-clustered parquet files. */
  def write(df: DataFrame, dims: Seq[String], path: String,
            numFiles: Int, bits: Int = 8): Unit =
    cluster(df, dims, bits)
      .repartitionByRange(numFiles, col(ZCol))
      .sortWithinPartitions(ZCol)
      .drop(ZCol)
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of each dimension — the same stats a parquet
    * footer exposes to scan planning, materialized as rows so layout
    * quality is queryable (and assertable in specs).
    */
  def fileStats(spark: SparkSession, path: String,
                dims: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        dims.flatMap(d => Seq(min(col(d)).as(s"min_$d"),
          max(col(d)).as(s"max_$d"))): _*)

  /** How many files a conjunctive box filter must read under this
    * layout: files whose [min,max] envelope intersects every
    * dimension's [lo,hi]. The fraction of files NOT counted here is
    * exactly what footer-stats pruning skips.
    */
  def filesTouched(spark: SparkSession, path: String,
                   box: Seq[(String, Double, Double)]): Long = {
    val stats = fileStats(spark, path, box.map(_._1))
    val cond = box.map { case (d, lo, hi) =>
      val t = stats.schema(s"min_$d").dataType
      numView(col(s"max_$d"), t) >= lo && numView(col(s"min_$d"), t) <= hi
    }.reduce(_ && _)
    stats.filter(cond).count()
  }
}

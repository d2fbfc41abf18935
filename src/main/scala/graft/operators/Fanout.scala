package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan fan-out (r17, measured: profile of
  * text_importance showed ONE 3.0 s single-task stage doing the whole
  * n-gram explode+hash — the test parquet is a single row group, so
  * every scan is one split and every heavy scan-side projection ran
  * on one of 32 cores).
  *
  * [[widen]] round-robin-rebalances a frame across the cluster ONLY
  * when its planned parallelism is below the session's default
  * parallelism. At production scale a table arrives in many splits
  * (numPartitions >= cores) and this is the IDENTITY — no shuffle is
  * ever added to a wide scan; in the single-split / few-files regime
  * it trades one small exchange for using every core in the heavy
  * stage that follows.
  *
  * Call it AFTER the narrow projection/filter (the guide §2.3 rule:
  * project before the exchange, so only needed columns cross), and
  * only in front of genuinely heavy per-row work (explode+hash,
  * shingling, codecs, regex batteries) — a plain aggregate's partial
  * pass is cheaper than the exchange.
  *
  * Results are partitioning-invariant for every caller (aggregates /
  * equi-joins over the rebalanced rows); the operators that use it
  * are oracle-checked end to end.
  */
object Fanout {

  /** A/B kill switch for measurement (SPARK_GRAFT_NO_WIDEN=1 makes
    * widen the identity) — lets the same build time a query with and
    * without the rebalance.
    */
  private val disabled = sys.env.get("SPARK_GRAFT_NO_WIDEN").contains("1")

  def widen(df: DataFrame): DataFrame = if (disabled) df else {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // probe via toRdd: QueryExecution caches it lazily, so the same
    // RDD backs the eventual action — unlike df.rdd, which builds a
    // fresh deserializer RDD per call just to read the partition
    // count (the Dedup.spread convention)
    val parts = df.queryExecution.toRdd.getNumPartitions
    if (parts < math.max(2, target / 2)) df.repartition(target) else df
  }
}

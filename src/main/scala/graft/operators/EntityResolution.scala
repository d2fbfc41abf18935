package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity-resolution clustering — the master-data /
  * catalog-dedup workload: candidate pairs only within a cheap
  * blocking key (default: last name token), verified by edit
  * distance, then transitive clustering via pointer-jumping
  * connected components; representative = lexicographic min;
  * singletons are their own cluster.
  *
  * Every candidate-pair path in this library is |block|²-bounded AND
  * capped: a hot block (many names sharing a blocking key) would
  * otherwise pay |block|² levenshtein evaluations with no opt-out.
  * Over-cap blocks skip pair generation — their names fall through as
  * singleton clusters — and are quantified by [[clusterWithReport]],
  * the same skip-and-report convention as Dedup's
  * maxShinglePosting / maxBucketSize caps.
  */
object EntityResolution {

  def defaultBlockKey(c: Column): Column = element_at(split(c, " "), -1)

  /** Cluster distinct values of `nameCol`; output (nameCol, cluster). */
  def cluster(df: DataFrame, nameCol: String,
              maxEdit: Int = 2, maxBlockSize: Int = 1000,
              partitions: Int = 4,
              blockKey: Column => Column = defaultBlockKey): DataFrame =
    clusterWithReport(df, nameCol, maxEdit, maxBlockSize, partitions,
      blockKey)._1

  /** [[cluster]] plus a ONE-row report — (blocks_skipped,
    * names_skipped, corpus_fraction) — quantifying the hot blocks the
    * cap excluded from fuzzy matching.
    */
  def clusterWithReport(df: DataFrame, nameCol: String,
                        maxEdit: Int = 2, maxBlockSize: Int = 1000,
                        partitions: Int = 4,
                        blockKey: Column => Column = defaultBlockKey)
      : (DataFrame, DataFrame) = {
    // r18 (profiled: 47 jobs of ≤0.18 s stages — fixed-cost death):
    // the distinct name universe feeds BOTH the blocking side and the
    // final representative join; pin it once so the distinct subtree
    // isn't replanted per consumer. The block exchange takes the same
    // small explicit partition count as the components fixpoint — the
    // name universe is a dim column's distinct values (model-sized),
    // and 32 near-empty tasks per stage cost more scheduling than
    // compute (result invariant: hash layout, block-local joins).
    val names = df.select(col(nameCol).as("na")).distinct()
      .localCheckpoint(true)
    val blocked = names.select(col("na"), blockKey(col("na")).as("blk"))
      .repartition(math.max(1, partitions), col("blk"))
    // block sizes from the same exchange the self-join consumes
    // (ReuseExchange collapses them); only pair-capable, under-cap
    // blocks enter the |block|²-bounded edit-distance join
    val sizes = blocked.groupBy("blk").agg(count(lit(1)).as("cnt"))
    val okBlocks = sizes.filter(col("cnt").between(2, maxBlockSize))
      .select("blk")
    val report = sizes.agg(
      coalesce(sum(when(col("cnt") > maxBlockSize, 1L)), lit(0L))
        .as("blocks_skipped"),
      coalesce(sum(when(col("cnt") > maxBlockSize, col("cnt"))), lit(0L))
        .as("names_skipped"),
      sum(col("cnt")).as("__total"))
      .select(col("blocks_skipped"), col("names_skipped"),
        round(col("names_skipped") / col("__total"), 6).as("corpus_fraction"))
    val kept = blocked.join(okBlocks, Seq("blk"))
    val pairs = kept.join(
        kept.select(col("na").as("nb"), col("blk")), Seq("blk"))
      .filter(col("na") < col("nb") &&
        levenshtein(col("na"), col("nb")) <= maxEdit)
      .select(col("na"), col("nb"))
    // the name universe is a dim column's distinct values — model
    // sized — so a small explicit partition count drops most of the
    // per-iteration task-scheduling overhead (result invariant)
    val comp = Components.connectedComponents(pairs, "na", "nb", partitions)
      .select(col("id").as("na"), col("component"))
    val out = names.join(comp, Seq("na"), "left")
      .select(col("na").as(nameCol),
        coalesce(col("component"), col("na")).as("cluster"))
    (out, report)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — grouping documents into training
  * sequences of at most `budget` tokens (the batch-assembly step of
  * an LLM data pipeline).
  *
  * Two variants with different guarantees:
  *
  *  - [[packByPrefixSum]]: bin = floor(cum_tokens_before / budget)
  *    within an explicit group column. One window per group partition,
  *    fully deterministic and SQL-expressible (oracle-checked as
  *    `text_seq_pack`). Bins average exactly `budget` tokens but a
  *    document straddling a boundary may push its bin over budget —
  *    the standard approximate packing used when throughput matters.
  *  - [[packGreedy]]: exact first-fit-in-order packing (bins NEVER
  *    exceed the budget unless a single document alone does). The
  *    fold is a sequential recurrence, so it runs per range-partition
  *    of the id — deterministic because range boundaries come from the
  *    ids themselves, parallel across partitions, property-spec'd.
  *
  * Scale: both shapes avoid any global single-reducer window — prefix
  * sums partition by the group column, greedy packs within range
  * partitions. 100 TB of documents pack with per-partition state of
  * one running counter.
  */
object SequencePack {

  /** Approximate packing: assign each document (ordered by `idCol`
    * within `groupCol`) the bin `floor(cumulative_tokens_before /
    * budget)`. Returns the input keys plus n_tokens / bin / bin_start.
    */
  def packByPrefixSum(df: DataFrame, idCol: String, textCol: String,
                      groupCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(groupCol),
      size(split(col(textCol), " ")).cast("bigint").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget).cast("bigint"))
      .withColumn("bin_start", (col("cum_before") % budget === 0).cast("boolean"))
  }

  /** Exact greedy packing within range partitions of the id: bins are
    * contiguous runs of documents; a bin closes when the next document
    * would overflow the budget. Bin ids are globally unique
    * (partition-prefixed). An over-budget single document gets its own
    * bin.
    */
  def packGreedy(df: DataFrame, idCol: String, textCol: String,
                 budget: Int, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    require(df.schema.fieldNames.contains(idCol),
      s"packGreedy: id column '$idCol' not in schema ${df.schema.fieldNames.mkString(", ")}")
    // id keeps its ORIGINAL type end-to-end (string/long/decimal doc
    // ids all pack); the external-row path reads it generically
    val idType = df.schema(idCol).dataType
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val sized = df.select(col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("bigint").as("n_tokens"))
      .repartitionByRange(parts, col("id"))
      .sortWithinPartitions("id")
    val out = sized.rdd.mapPartitionsWithIndex { (pid, iter) =>
      var bin = 0L
      var used = 0L
      var first = true
      iter.map { r =>
        val n = r.getLong(1)
        if (!first && used + n > budget) { bin += 1; used = 0L }
        first = false
        used += n
        Row(r.get(0), n, pid.toLong * 1000000000L + bin)
      }
    }
    spark.createDataFrame(out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bin", org.apache.spark.sql.types.LongType))))
      .withColumnRenamed("id", idCol)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerKey

import graft.functions._
import graft.plans.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2c rows 39-40).
  *
  * Baseline: brute-force cosine top-k with the QUERY side broadcast —
  * the 100 TB base never moves, each partition scores its vectors
  * against the in-memory query set and emits only per-partition
  * candidates. Scale path: hyperplane-LSH bucketing, so each base
  * vector is scored only against queries sharing its bucket.
  *
  * Top-k selection goes through the [[TopKPerKey]] exec, not
  * `row_number().over(Window.partitionBy(query_id))`: the window form
  * ships EVERY scored candidate to at most |queries| reducers and
  * sorts them — a fixed-width bottleneck no cluster size fixes. The
  * exec's map-side partial pass reduces each scan partition to k rows
  * per query before the exchange, so only |partitions|·|queries|·k
  * candidate rows ever move.
  */
object Similarity {

  /** Shared tail: scored candidates → k best per query with rank. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val candidates = scored.select(col("query_id"), col("base_id"), col("cosine"))
    TopKPerKey(candidates, Seq("query_id"),
      Seq("cosine" -> true, "base_id" -> false), k, rankCol = Some("rank"))
      .select(col("query_id"), col("base_id"), col("rank"), col("cosine"))
  }

  /** Exact top-k neighbors per query vector by cosine similarity.
    * `queries` is expected to be small (it is broadcast); ties break
    * on neighbor id.
    */
  def bruteForceTopK(base: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int = 5): DataFrame = {
    GraftFunctions.register(base.sparkSession)
    val b = base.select(col(idCol).as("base_id"), col(vecCol).as("base_v"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
    val scored = b.crossJoin(broadcast(q))
      .filter(col("base_id") =!= col("query_id"))
      .withColumn("cosine", GraftFunctions.cosineFast(col("base_v"), col("query_v")))
    topKPerQuery(scored, k)
  }

  /** LSH-bucketed ANN: base and queries are hashed into hyperplane
    * sign buckets; scoring happens only within a bucket. Recall is
    * traded for a `2^numPlanes`-way reduction in comparisons; the
    * spec measures recall against `bruteForceTopK`.
    */
  def lshTopK(base: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int = 5,
              numPlanes: Int = 4): DataFrame = {
    GraftFunctions.register(base.sparkSession)
    val b = base.select(col(idCol).as("base_id"), col(vecCol).as("base_v"),
      hyperplaneBucket(col(vecCol), numPlanes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"),
      hyperplaneBucket(col(vecCol), numPlanes).as("bucket"))
    val scored = b.join(broadcast(q), Seq("bucket"))
      .filter(col("base_id") =!= col("query_id"))
      .withColumn("cosine", GraftFunctions.cosineFast(col("base_v"), col("query_v")))
    topKPerQuery(scored, k)
  }

}

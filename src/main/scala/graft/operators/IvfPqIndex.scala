package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerKey

import graft.plans.GraftFunctions

/** IVFADC — the [[IvfIndex]] × [[PqIndex]] composition and the
  * standard billion-scale ANN layout (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011, §V): the
  * coarse quantizer routes each vector into one of `numCentroids`
  * inverted lists, and inside every list the vector is stored as its
  * `numSub`-byte PQ code instead of the float array. A probe then
  * compounds BOTH savings: partition pruning reads only
  * ~nProbe/numCentroids of the corpus, and what it reads is the
  * 8-byte code column instead of the 256-byte float vector — at
  * 100 TB that is nProbe pruning × ~32× fewer scan bytes, the
  * difference between a probe that touches terabytes and one that
  * touches gigabytes.
  *
  * Codes are direct encodings of the (unit-normalized) vector — the
  * `by_residual = false` IVFADC variant — so one shared codebook
  * serves every list and scoring is exactly
  * [[PqIndex.asymmetricScore]]: the query stays exact, the base side
  * is its codebook reconstruction, `score = Σ_s q_s · c_s[code_s]`
  * ≈ cosine. Residual encoding would buy recall at equal code size
  * but needs per-probe shifted lookup tables; the direct form keeps
  * the scoring expression fully codegen'd and identical to the flat
  * PQ path, and recall vs brute force is spec-measured.
  *
  * Layout under `dir`:
  *   - `centroids` — the coarse model ([[IvfIndex.load]]-compatible)
  *   - `pq`        — the PQ codebooks ([[PqIndex.loadModel]])
  *   - `lists`     — (base_id, codes array<tinyint>) PARTITIONED BY
  *                   the coarse list id `c`; probes prune on it
  *                   (PartitionFilters asserted by spec)
  *
  * Refresh follows the [[IvfIndex.refresh]] append-only convention:
  * both models stay fixed, delta vectors are assigned + encoded and
  * appended into their list partitions.
  */
object IvfPqIndex {

  case class Model(ivf: IvfIndex.Model, pq: PqIndex.Model)

  /** Train both quantizers off the same corpus. Driver state is the
    * two models only (k×dim + numSub×codes×subDim doubles).
    */
  def train(base: DataFrame, idCol: String, vecCol: String,
            numCentroids: Int = 16, numSub: Int = 8,
            codesPerSub: Int = 64, iters: Int = 2): Model =
    Model(
      IvfIndex.train(base, idCol, vecCol, numCentroids, iters),
      PqIndex.train(base, idCol, vecCol, numSub, codesPerSub, iters))

  /** One pass over the corpus: coarse-assign + PQ-encode every vector
    * and write the coded inverted file. The float vectors are NOT
    * stored — the index is the codes.
    */
  def save(base: DataFrame, idCol: String, vecCol: String,
           model: Model, dir: String): Unit = {
    val spark = base.sparkSession
    GraftFunctions.register(spark)
    IvfIndex.saveModel(spark, model.ivf, dir)
    PqIndex.saveModel(spark, model.pq, s"$dir/pq")
    encoded(base, idCol, vecCol, model)
      .write.mode("overwrite").partitionBy("c").parquet(s"$dir/lists")
  }

  /** (base_id, codes, c) — the stored row shape: assignment from the
    * coarse model and codes from the shared PQ codebooks, both as
    * expressions in ONE scan-side projection (no join, no shuffle
    * before the partitioned write's own exchange). Shared with the
    * streaming refresher.
    */
  private[graft] def encoded(df: DataFrame, idCol: String, vecCol: String,
                             model: Model): DataFrame =
    IvfIndex.assign(df, idCol, vecCol, model.ivf)
      .select(col("base_id"),
        PqIndex.codesExpr(col("base_v"), model.pq).as("codes"), col("c"))

  /** Append-only incremental refresh under the fixed models (the
    * [[IvfIndex.refresh]] convention: recall degrades only with
    * distribution drift; retrain + save then). Returns rows appended.
    */
  def refresh(delta: DataFrame, idCol: String, vecCol: String,
              dir: String): Long = {
    val spark = delta.sparkSession
    GraftFunctions.register(spark)
    val model = load(spark, dir)
    val enc = encoded(delta, idCol, vecCol, model).persist()
    try {
      val n = enc.count()
      if (n > 0L)
        enc.write.mode("append").partitionBy("c").parquet(s"$dir/lists")
      n
    } finally enc.unpersist()
  }

  def load(spark: SparkSession, dir: String): Model =
    Model(IvfIndex.load(spark, dir), PqIndex.loadModel(spark, s"$dir/pq"))

  /** Top-k per query against the saved index. The scan is the probed
    * partitions of the CODE column only: static isin partition
    * pruning on the coarse id (model-sized literal list), asymmetric
    * PQ scoring inside, heap-based [[TopKPerKey]] on top — no window
    * sort, no float corpus read anywhere.
    */
  def topK(spark: SparkSession, dir: String, queries: DataFrame,
           idCol: String, vecCol: String, k: Int = 5,
           nProbe: Int = 4): DataFrame = {
    GraftFunctions.register(spark)
    val model = load(spark, dir)
    val probes = IvfIndex.probeLists(queries, idCol, vecCol, model.ivf, nProbe)
      .withColumn("qv", PqIndex.normalized(col("query_v")))
      .drop("query_v")
    val probedCs = probes.select("c").distinct().collect().map(_.getInt(0)).toSeq
    // base coded lists plus any complete streaming delta roots
    // (IvfIndex.listRoots is layout-generic: lists/ + delta/ dirs
    // partitioned by c) — the isin filter prunes every root
    val scored = IvfIndex.listRoots(spark, dir).map(spark.read.parquet(_))
      .reduce(_ unionByName _)
      .filter(col("c").isin(probedCs: _*))
      .join(broadcast(probes), Seq("c"))
      .filter(col("base_id") =!= col("query_id"))
      .withColumn("score",
        PqIndex.asymmetricScore(col("qv"), col("codes"), model.pq))
      .select(col("query_id"), col("base_id"), col("score"))
    TopKPerKey(scored, Seq("query_id"),
      Seq("score" -> true, "base_id" -> false), k, rankCol = Some("rank"))
      .select(col("query_id"), col("base_id"), col("rank"), col("score"))
  }
}

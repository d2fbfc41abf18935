package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.plans.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor — the
  * coarse-quantizer scale path for similarity search
  * (SURVEY.md §2c row 39/40).
  *
  * Train: k centroids via Lloyd iterations executed as DataFrame
  * aggregations (posexplode → per-(cluster, dim) means); only the
  * k×dim centroid model ever reaches the driver. Deterministic init:
  * the k vectors with the smallest xxhash64(id).
  *
  * Search: each base vector belongs to ONE centroid list; a query
  * probes its `nProbe` nearest lists, so the scored fraction is
  * ~nProbe/k of the corpus instead of all of it. Scoring reuses the
  * codegen'd graft_cosine expression.
  */
object IvfIndex {

  case class Model(centroids: Seq[Seq[Double]]) {
    def numCentroids: Int = centroids.size
  }

  private def centroidArrayCol(model: Model) = {
    // literal array<array<double>> of the centroid matrix
    array(model.centroids.map(c => array(c.map(lit): _*)): _*)
  }

  /** Column: index (0-based) of the centroid nearest to `v` by cosine. */
  private def nearestCentroid(v: org.apache.spark.sql.Column, model: Model) = {
    val sims = transform(centroidArrayCol(model), c => cosineSim(v, c))
    // argmax via (sim, -idx) struct max
    val idx = sequence(lit(0), lit(model.numCentroids - 1))
    val best = aggregate(
      zip_with(sims, idx, (s, i) => struct(s.as("s"), (-i).as("ni"))),
      struct(lit(Double.MinValue).as("s"), lit(0).as("ni")),
      (acc, x) => when(x.getField("s") > acc.getField("s"), x).otherwise(acc))
    (-best.getField("ni")).cast("int")
  }

  /** Train centroids with `iters` Lloyd iterations. */
  def train(base: DataFrame, idCol: String, vecCol: String,
            numCentroids: Int = 16, iters: Int = 2): Model = {
    val vecs = base.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    // deterministic seed pick: smallest hash ids
    val init = vecs.withColumn("h", xxhash64(col("id")))
      .orderBy("h").limit(numCentroids)
      .select("v").collect().map(rowToVec).toSeq
    var model = Model(init)
    (0 until iters).foreach { _ =>
      val assigned = vecs.withColumn("c", nearestCentroid(col("v"), model))
      val means = assigned
        .select(col("c"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("c", "pos").agg(avg("x").as("m"))
        .groupBy("c")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("c"), transform(col("pm"), p => p.getField("m")).as("v"))
        .collect()
      val updated = means.map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      // empty clusters keep their previous centroid
      model = Model(model.centroids.zipWithIndex.map { case (c, i) => updated.getOrElse(i, c) })
    }
    model
  }

  private def rowToVec(r: Row): Seq[Double] = r.getSeq[Double](0).toSeq

  /** Top-k per query probing `nProbe` centroid lists. */
  def topK(base: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           model: Model, k: Int = 5, nProbe: Int = 4): DataFrame = {
    GraftFunctions.register(base.sparkSession)
    val b = base.select(col(idCol).as("base_id"), col(vecCol).as("base_v"))
      .withColumn("c", nearestCentroid(transform(col("base_v"), _.cast("double")), model))
    // queries explode to their nProbe nearest centroids
    val sims = transform(centroidArrayCol(model),
      c => cosineSim(transform(col("query_v"), _.cast("double")), c))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
      .withColumn("ranked",
        slice(array_sort(zip_with(sims, sequence(lit(0), lit(model.numCentroids - 1)),
          (s, i) => struct((-s).as("ns"), i.as("i")))), 1, nProbe))
      .select(col("query_id"), col("query_v"),
        explode(transform(col("ranked"), r => r.getField("i"))).as("c"))
    val scored = b.join(broadcast(probes), Seq("c"))
      .filter(col("base_id") =!= col("query_id"))
      .withColumn("cosine", GraftFunctions.cosineFast(col("base_v"), col("query_v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("base_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("base_id"), col("rank"), col("cosine"))
  }
}

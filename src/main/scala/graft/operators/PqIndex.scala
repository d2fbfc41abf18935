package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/** Product-quantization (PQ) ANN — the COMPRESSED-corpus scale path
  * beside int8 quantization ([[Similarity.quantize]], 4×) and IVF
  * pruning ([[IvfIndex]]): vectors are unit-normalized, split into
  * `numSub` subvectors, and each subvector is replaced by the id of
  * its nearest subspace centroid (per-subspace Lloyd/k-means, the
  * Jégou et al. PQ construction). A 64-dim float corpus at the
  * default 8 sub × ≤128 codes stores 8 BYTES per vector — 32× fewer
  * scan bytes than float32 — which at 100 TB is the difference
  * between a corpus that fits the page cache and one that doesn't.
  *
  * Training runs per subspace as DataFrame aggregations (assignment =
  * codegen'd `graft_dot` argmin via `|c|²/2 − v·c`, means via
  * posexplode), so only the numSub × codes × subDim codebook ever
  * reaches the driver — same discipline as [[IvfIndex.train]].
  *
  * Search scores queries against RECONSTRUCTED vectors
  * (asymmetric-distance style: the query stays exact, the base side
  * is its codebook approximation): `score = Σ_s q_s · c_s[code_s]`,
  * evaluated as one codegen'd dot per subspace against an
  * `element_at` into the codebook literal. In this declarative form
  * the arithmetic per pair matches brute force (numSub × subDim
  * multiplies) — the scale win is the SCAN: 8-byte codes move through
  * the shuffle-free crossJoin instead of 256-byte vectors. Top-k
  * selection goes through [[org.apache.spark.sql.graft.TopKPerKey]]
  * like every other ANN path. Recall vs exact brute force is
  * spec-measured.
  */
object PqIndex {

  /** codebooks(sub)(code) = centroid subvector of length subDim. */
  case class Model(numSub: Int, subDim: Int,
                   codebooks: Seq[Seq[Seq[Double]]]) {
    require(codebooks.size == numSub)
    def codesPerSub: Int = codebooks.head.size
  }

  /** Unit-normalize (zero vectors stay zero), as array<double>. */
  private[operators] def normalized(vecCol: Column): Column = {
    val v = transform(vecCol, _.cast("double"))
    val n = sqrt(GraftFunctions.dotFast(v, v))
    when(n > 0.0, transform(v, x => x / n)).otherwise(v)
  }

  private def subvector(v: Column, sub: Int, subDim: Int): Column =
    slice(v, sub * subDim + 1, subDim)

  private def centroidLit(c: Seq[Double]): Column = array(c.map(lit): _*)

  /** Index (0-based) of the L2-nearest code for a subvector:
    * argmin |v−c|² = argmax (v·c − |c|²/2); struct-greatest argmax,
    * one codegen'd dot per code — no interpreted HOFs in the row loop.
    */
  private def nearestCode(vsub: Column, codes: Seq[Seq[Double]]): Column = {
    val scored = codes.zipWithIndex.map { case (c, i) =>
      val halfNormSq = c.map(x => x * x).sum / 2.0
      struct((GraftFunctions.dotFast(vsub, centroidLit(c)) - lit(halfNormSq)).as("s"),
        lit(-i).as("ni"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    (-best.getField("ni")).cast("int")
  }

  /** Train per-subspace codebooks with `iters` Lloyd iterations each.
    * `dim` must be divisible by `numSub`.
    */
  def train(base: DataFrame, idCol: String, vecCol: String,
            numSub: Int = 8, codesPerSub: Int = 16,
            iters: Int = 2, normalizeInput: Boolean = true): Model = {
    GraftFunctions.register(base.sparkSession)
    val probe = base.select(size(col(vecCol))).head().getInt(0)
    require(probe % numSub == 0,
      s"dim $probe not divisible by numSub $numSub")
    val subDim = probe / numSub
    // normalizeInput = false: the input is already in score space
    // (e.g. IVFADC residuals, which must NOT be re-normalized — the
    // reconstruction centroid + residual depends on their magnitude)
    val prep =
      if (normalizeInput) normalized(col(vecCol))
      else transform(col(vecCol), _.cast("double"))
    val vecs = base.select(col(idCol).as("id"), prep.as("v"))
      .cache() // re-scanned per subspace iteration
    try {
      val codebooks = (0 until numSub).map { s =>
        val sv = subvector(col("v"), s, subDim)
        // deterministic seed pick: smallest-hash ids' subvectors
        val init = vecs.withColumn("h", xxhash64(col("id")))
          .orderBy("h").limit(codesPerSub)
          .select(sv.as("sv")).collect().map(_.getSeq[Double](0).toSeq).toSeq
        var codes = init
        (0 until iters).foreach { _ =>
          val assigned = vecs.select(nearestCode(sv, codes).as("c"), sv.as("sv"))
          val means = assigned
            .select(col("c"), posexplode(col("sv")).as(Seq("pos", "x")))
            .groupBy("c", "pos").agg(avg("x").as("m"))
            .groupBy("c")
            .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
            .select(col("c"), transform(col("pm"), p => p.getField("m")).as("sv"))
            .collect()
          val updated = means.map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
          codes = codes.zipWithIndex.map { case (c, i) => updated.getOrElse(i, c) }
        }
        codes
      }
      Model(numSub, subDim, codebooks)
    } finally vecs.unpersist()
  }

  /** Encode the corpus: (idCol, codes array<tinyint>) — the stored
    * form is numSub bytes per vector. Requires codesPerSub ≤ 128
    * (tinyint is signed).
    */
  def encode(base: DataFrame, idCol: String, vecCol: String,
             model: Model, normalizeInput: Boolean = true): DataFrame = {
    GraftFunctions.register(base.sparkSession)
    base.select(col(idCol),
      codesExpr(col(vecCol), model, normalizeInput).as("codes"))
  }

  /** The code array as a column expression (normalize → per-subspace
    * argmin), so composing indexes ([[IvfPqIndex]]) can encode inside
    * an existing projection instead of via a join.
    */
  private[operators] def codesExpr(vecCol: Column, model: Model,
                                   normalizeInput: Boolean = true): Column = {
    require(model.codesPerSub <= 128, "codesPerSub > 128 does not fit tinyint")
    val v =
      if (normalizeInput) normalized(vecCol)
      else transform(vecCol, _.cast("double"))
    array((0 until model.numSub).map(s =>
      nearestCode(subvector(v, s, model.subDim), model.codebooks(s))
        .cast("tinyint")): _*)
  }

  /** Top-k per query against the ENCODED corpus. Queries stay exact
    * (asymmetric): per subspace the query slice dots the codebook
    * entry its pair's code selects. Output
    * (query_id, base_id, rank, score) with score ≈ cosine (both sides
    * ~unit norm).
    */
  /** Asymmetric-distance score column: the exact (normalized) query
    * in `qv` against the codebook reconstruction the `codes` column
    * selects — `Σ_s qv_s · codebook_s[code_s]`, one codegen'd dot per
    * subspace. Shared by [[topK]] and the [[IvfPqIndex]] composition.
    */
  private[operators] def asymmetricScore(qv: Column, codes: Column,
                                         model: Model): Column =
    (0 until model.numSub).map { s =>
      val cb = array(model.codebooks(s).map(centroidLit): _*)
      GraftFunctions.dotFast(
        subvector(qv, s, model.subDim),
        element_at(cb, codes.getItem(s).cast("int") + 1))
    }.reduce(_ + _)

  def topK(encoded: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, model: Model, k: Int = 5): DataFrame = {
    GraftFunctions.register(encoded.sparkSession)
    val q = queries.select(col(idCol).as("query_id"),
      normalized(col(vecCol)).as("qv"))
    val score = asymmetricScore(col("qv"), col("codes"), model)
    val scored = encoded.select(col(idCol).as("base_id"), col("codes"))
      .crossJoin(broadcast(q))
      .filter(col("base_id") =!= col("query_id"))
      .withColumn("score", score)
      .select(col("query_id"), col("base_id"), col("score"))
    org.apache.spark.sql.graft.TopKPerKey(scored, Seq("query_id"),
      Seq("score" -> true, "base_id" -> false), k, rankCol = Some("rank"))
      .select(col("query_id"), col("base_id"), col("rank"), col("score"))
  }

  /** Persist / load the codebook model (one model-sized parquet). */
  def saveModel(spark: SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    val rows = for (s <- 0 until model.numSub; c <- 0 until model.codesPerSub)
      yield (s, c, model.codebooks(s)(c))
    rows.toDF("sub", "code", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  def loadModel(spark: SparkSession, dir: String): Model = {
    val rows: Array[Row] = spark.read.parquet(dir)
      .orderBy("sub", "code").collect()
    val bySub = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq
      }
    Model(bySub.size, bySub.head.head.size, bySub)
  }
}

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
  * TWO encoding variants at the same code size (Jégou §V's
  * by_residual trade, selected at [[train]] and persisted with the
  * index):
  *
  *  - DIRECT (`byResidual = false`, default): codes encode the
  *    unit-normalized vector itself, one shared codebook serves every
  *    list, and scoring is exactly [[PqIndex.asymmetricScore]] —
  *    identical to the flat PQ path (the probe-all == flat-PQ parity
  *    spec).
  *  - RESIDUAL (`byResidual = true`): codes encode v̂ − s_c, where
  *    s_c is the list's coarse REPRODUCTION VALUE in score space —
  *    the mean of the list's normalized vectors (the paper's q1(v);
  *    the mean is the variance-minimizing shift, so E|residual|² =
  *    E|v̂|² − |s_c|² ≤ E|v̂|², never more: subtracting the
  *    unit-norm centroid DIRECTION instead would inflate variance on
  *    weakly-clustered corpora). Residuals concentrate nearer 0 than
  *    the vectors, so the same 8 bytes quantize finer: the
  *    RECONSTRUCTION error at equal code size drops (spec-measured
  *    through the saved index on a clustered corpus). Scoring shifts
  *    per probe:
  *    `score = q · s_c + Σ_s q_s · c_s[code_s]` — the q·s_c term is
  *    the paper's per-probe shifted lookup table, computed ONCE per
  *    (query, probe) pair on the model-sized probe frame, so the
  *    per-row hot loop stays the same codegen'd subspace dots.
  *
  *    HONEST LIMIT, pinned by spec: under COSINE scoring the lower
  *    reconstruction MSE does not buy recall on these corpora. A
  *    normalized same-cluster query weights the coarse direction ~1
  *    and the discriminating noise dimensions ~1/|v|, while k-means
  *    MSE treats all dimensions equally — direct encoding spends its
  *    codes exactly where queries look (the mode), residual encoding
  *    spreads them across dimensions queries down-weight. This is the
  *    anisotropic-quantization observation behind ScaNN (Guo et al.
  *    2020), and why Faiss defaults by_residual = false for
  *    inner-product metrics. The paper's recall gain is an
  *    L2-distance result. Both variants stay behind one API; direct
  *    remains the default.
  *
  * Layout under `dir`:
  *   - `centroids` — the coarse model ([[IvfIndex.load]]-compatible)
  *   - `pq`        — the PQ codebooks ([[PqIndex.loadModel]])
  *   - `variant`   — "residual" | "direct" (absent = direct, the
  *                   pre-variant layout)
  *   - `shifts`    — (c, shift) per-list reproduction values
  *                   (residual variant only)
  *   - `lists`     — (base_id, codes array<tinyint>) PARTITIONED BY
  *                   the coarse list id `c`; probes prune on it
  *                   (PartitionFilters asserted by spec)
  *
  * Refresh follows the [[IvfIndex.refresh]] append-only convention:
  * both models stay fixed, delta vectors are assigned + encoded and
  * appended into their list partitions.
  */
object IvfPqIndex {

  /** `shifts(c)` = the list's coarse reproduction value in score
    * space (residual variant); empty for the direct variant.
    */
  case class Model(ivf: IvfIndex.Model, pq: PqIndex.Model,
                   byResidual: Boolean = false,
                   shifts: Seq[Seq[Double]] = Nil)

  /** The shift table as an array-of-arrays literal —
    * `element_at(·, c + 1)` selects a row's list shift inside a
    * projection (model-sized literal, no join).
    */
  private def shiftsLit(model: Model): org.apache.spark.sql.Column =
    array(model.shifts.map(s => array(s.map(lit): _*)): _*)

  /** Train both quantizers off the same corpus. Driver state is the
    * two models only (k×dim + numSub×codes×subDim doubles) plus, for
    * `byResidual`, the per-list shift table (k×dim). Residuals are
    * v̂ − s_c with s_c the list mean of the normalized vectors, and
    * are NOT re-normalized — the reconstruction identity
    * v̂ ≈ s_c + recon(codes) depends on their magnitude.
    */
  def train(base: DataFrame, idCol: String, vecCol: String,
            numCentroids: Int = 16, numSub: Int = 8,
            codesPerSub: Int = 64, iters: Int = 2,
            byResidual: Boolean = false): Model = {
    val ivf = IvfIndex.train(base, idCol, vecCol, numCentroids, iters)
    if (!byResidual)
      Model(ivf, PqIndex.train(base, idCol, vecCol, numSub,
        codesPerSub, iters))
    else {
      val assigned = IvfIndex.assign(base, idCol, vecCol, ivf)
        .select(col("base_id"),
          PqIndex.normalized(col("base_v")).as("__vn"), col("c"))
        .localCheckpoint(true) // feeds the shift aggregate + PQ train
      // per-list mean of the normalized vectors — the
      // variance-minimizing shift (k×dim, model-sized)
      val means = assigned
        .select(col("c"), posexplode(col("__vn")).as(Seq("pos", "x")))
        .groupBy("c", "pos").agg(avg("x").as("m"))
        .groupBy("c")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("c"),
          transform(col("pm"), p => p.getField("m")).as("shift"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      // an empty list has nothing to encode; a zero shift keeps its
      // probe term inert
      val dim = ivf.centroids.head.size
      val shifts = (0 until ivf.numCentroids)
        .map(c => means.getOrElse(c, Seq.fill(dim)(0.0)))
      val withShift = Model(ivf, PqIndex.Model(1, dim, Seq(Seq(Seq(0.0)))),
        byResidual = true, shifts = shifts) // pq placeholder for residualExpr
      val resid = assigned.select(col("base_id"),
        residualExpr(col("__vn"), col("c"), withShift, preNormalized = true)
          .as("__resid"))
      val pq = PqIndex.train(resid, "base_id", "__resid", numSub,
        codesPerSub, iters, normalizeInput = false)
      Model(ivf, pq, byResidual = true, shifts = shifts)
    }
  }

  /** v̂ − s_c for a row whose coarse assignment is in `cCol`. */
  private def residualExpr(vecCol: org.apache.spark.sql.Column,
                           cCol: org.apache.spark.sql.Column,
                           model: Model,
                           preNormalized: Boolean = false)
      : org.apache.spark.sql.Column = {
    val v = if (preNormalized) vecCol else PqIndex.normalized(vecCol)
    zip_with(v, element_at(shiftsLit(model), cCol + 1), (a, b) => a - b)
  }

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
    val root = new org.apache.hadoop.fs.Path(dir)
    graft.sinks.TableVersions.writeSmall(
      root.getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(root, "variant"),
      if (model.byResidual) "residual" else "direct")
    if (model.byResidual) {
      import spark.implicits._
      model.shifts.zipWithIndex.map { case (s, c) => (c, s) }
        .toDF("c", "shift").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/shifts")
    }
    encoded(base, idCol, vecCol, model)
      .write.mode("overwrite").partitionBy("c").parquet(s"$dir/lists")
  }

  /** (base_id, codes, c) — the stored row shape: assignment from the
    * coarse model and codes from the shared PQ codebooks (residual
    * variant: codes of v̂ − ĉ_c), all as expressions in ONE scan-side
    * projection (no join, no shuffle before the partitioned write's
    * own exchange). Shared with the streaming refresher.
    */
  private[graft] def encoded(df: DataFrame, idCol: String, vecCol: String,
                             model: Model): DataFrame = {
    val assigned = IvfIndex.assign(df, idCol, vecCol, model.ivf)
    val codes =
      if (!model.byResidual) PqIndex.codesExpr(col("base_v"), model.pq)
      else PqIndex.codesExpr(
        residualExpr(col("base_v"), col("c"), model),
        model.pq, normalizeInput = false)
    assigned.select(col("base_id"), codes.as("codes"), col("c"))
  }

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

  def load(spark: SparkSession, dir: String): Model = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val variant = graft.sinks.TableVersions.readSmall(
      root.getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(root, "variant"))
    val byResidual = variant.exists(_.trim == "residual")
    val shifts =
      if (!byResidual) Nil
      else spark.read.parquet(s"$dir/shifts").orderBy("c")
        .collect().map(_.getSeq[Double](1).toSeq).toSeq
    Model(IvfIndex.load(spark, dir), PqIndex.loadModel(spark, s"$dir/pq"),
      byResidual = byResidual, shifts = shifts)
  }

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
    val probes0 = IvfIndex.probeLists(queries, idCol, vecCol, model.ivf, nProbe)
      .withColumn("qv", PqIndex.normalized(col("query_v")))
      .drop("query_v")
    // residual variant: the per-probe shift q·ĉ_c is computed here on
    // the model-sized probe frame — the per-row loop below stays the
    // same codegen'd subspace dots as the direct form
    val probes =
      if (!model.byResidual) probes0.withColumn("qc", lit(0.0))
      else probes0.withColumn("qc", GraftFunctions.dotFast(col("qv"),
        element_at(shiftsLit(model), col("c") + 1)))
    val probedCs = probes.select("c").distinct().collect().map(_.getInt(0)).toSeq
    // base coded lists plus any complete streaming delta roots
    // (IvfIndex.listRoots is layout-generic: lists/ + delta/ dirs
    // partitioned by c) — the isin filter prunes every root
    val scored = IvfIndex.listRoots(spark, dir).map(spark.read.parquet(_))
      .reduce(_ unionByName _)
      .filter(col("c").isin(probedCs: _*))
      .join(broadcast(probes), Seq("c"))
      .filter(col("base_id") =!= col("query_id"))
      .withColumn("score", col("qc") +
        PqIndex.asymmetricScore(col("qv"), col("codes"), model.pq))
      .select(col("query_id"), col("base_id"), col("score"))
    TopKPerKey(scored, Seq("query_id"),
      Seq("score" -> true, "base_id" -> false), k, rankCol = Some("rank"))
      .select(col("query_id"), col("base_id"), col("rank"), col("score"))
  }
}

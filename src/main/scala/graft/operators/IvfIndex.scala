package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerKey

import graft.plans.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor — the
  * coarse-quantizer scale path for similarity search
  * (SURVEY.md §2c row 39/40).
  *
  * Train: k centroids via Lloyd iterations executed as DataFrame
  * aggregations (posexplode → per-(cluster, dim) means); only the
  * k×dim centroid model ever reaches the driver. Deterministic init:
  * the k vectors with the smallest xxhash64(id). The base vectors are
  * cached across iterations, and centroid assignment is ONE codegen'd
  * `graft_cosine` per centroid against a literal array with a
  * struct-greatest argmax — no interpreted higher-order functions in
  * the per-row loop.
  *
  * Search: each base vector belongs to ONE centroid list; a query
  * probes its `nProbe` nearest lists, so the scored fraction is
  * ~nProbe/k of the corpus instead of all of it. Scoring reuses the
  * codegen'd graft_cosine expression and the final top-k goes through
  * the heap-based [[TopKPerKey]] exec (map-side partial), not a
  * per-query window sort.
  */
object IvfIndex {

  case class Model(centroids: Seq[Seq[Double]]) {
    def numCentroids: Int = centroids.size
  }

  private def centroidLit(c: Seq[Double]): Column = array(c.map(lit): _*)

  /** Column: index (0-based) of the centroid nearest to `v` by cosine.
    * One codegen'd cosine per centroid; argmax via greatest over
    * (sim, -idx) structs — fully codegen'd, no interpreted HOFs.
    */
  private def nearestCentroid(v: Column, model: Model): Column = {
    val scored = model.centroids.zipWithIndex.map { case (c, i) =>
      struct(GraftFunctions.cosineFast(v, centroidLit(c)).as("s"), lit(-i).as("ni"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    (-best.getField("ni")).cast("int")
  }

  /** Train centroids with `iters` Lloyd iterations. */
  def train(base: DataFrame, idCol: String, vecCol: String,
            numCentroids: Int = 16, iters: Int = 2): Model = {
    GraftFunctions.register(base.sparkSession)
    val vecs = base.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
      .cache() // re-scanned once per Lloyd iteration
    try {
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
    } finally vecs.unpersist()
  }

  private def rowToVec(r: Row): Seq[Double] = r.getSeq[Double](0).toSeq

  /** Persist a trained index: `<dir>/centroids` (model) and
    * `<dir>/lists` — the inverted file itself, PARTITIONED BY the
    * centroid id, so a probe of nProbe lists reads exactly nProbe
    * partition directories (partition pruning, verified by spec).
    * Build once, search many — the assignment pass over the corpus is
    * paid at build time, not per query batch.
    */
  /** Persist just the centroid model (no inverted lists) — enough
    * for assignment-only consumers ([[graft.operators.Dedup.semanticDedupIndexed]]);
    * readable by [[load]].
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                dir: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("c", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
  }

  def save(base: DataFrame, idCol: String, vecCol: String,
           model: Model, dir: String): Unit = {
    val spark = base.sparkSession
    GraftFunctions.register(spark)
    saveModel(spark, model, dir)
    assign(base, idCol, vecCol, model)
      .write.mode("overwrite").partitionBy("c").parquet(s"$dir/lists")
    // train-time list-size distribution: the drift baseline every
    // refresh compares its delta against (model-sized: k rows)
    spark.read.parquet(s"$dir/lists").groupBy("c").count()
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Outcome of an incremental [[refresh]].
    *
    * @param deltaRows      vectors appended
    * @param drift          total-variation distance between the
    *                       delta's centroid-assignment distribution
    *                       and the train-time baseline (0 = same
    *                       shape, 1 = disjoint)
    * @param imbalance      max/mean current list size — how lopsided
    *                       the inverted file has become
    * @param retrainAdvised drift or imbalance crossed the caller's
    *                       thresholds: the fixed centroids no longer
    *                       fit the data; retrain + save
    */
  case class RefreshStats(deltaRows: Long, drift: Double,
                          imbalance: Double, retrainAdvised: Boolean)

  /** Incrementally refresh a SAVED index with a delta of NEW vectors,
    * without retraining: each delta vector is assigned to its nearest
    * centroid under the saved model and APPENDED into that centroid's
    * parquet list partition — the probe path sees it immediately and
    * partition pruning is unchanged. Centroids stay fixed (IVF recall
    * degrades only when the data distribution drifts; retrain+save
    * then). Append-only by design: an updated vector should arrive
    * under a new id, or the index rebuilt — parquet partitions don't
    * support in-place deletes.
    */
  def refresh(delta: DataFrame, idCol: String, vecCol: String, dir: String,
              driftThreshold: Double = 0.5,
              imbalanceThreshold: Double = 4.0): RefreshStats = {
    val spark = delta.sparkSession
    GraftFunctions.register(spark)
    val model = load(spark, dir)
    // indexes persisted before the stats baseline existed: backfill it
    // from the CURRENT lists before this delta lands, so the first
    // refresh on an old index measures drift instead of crashing
    val statsPath = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val fs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(statsPath))
      spark.read.parquet(s"$dir/lists").groupBy("c").count()
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
    val assigned = assign(delta, idCol, vecCol, model)
      .persist() // appended AND counted; one assignment pass
    try {
      // drift guard: model-sized aggregates only (k counts per side)
      val deltaCounts = assigned.groupBy("c").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val deltaRows = deltaCounts.values.sum
      if (deltaRows == 0L) return RefreshStats(0L, 0.0, 1.0, retrainAdvised = false)
      assigned.write.mode("append").partitionBy("c").parquet(s"$dir/lists")
      val baseCounts = spark.read.parquet(s"$dir/stats")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val baseRows = math.max(1L, baseCounts.values.sum)
      val drift = 0.5 * (0 until model.numCentroids).map { i =>
        math.abs(deltaCounts.getOrElse(i, 0L).toDouble / math.max(1L, deltaRows) -
          baseCounts.getOrElse(i, 0L).toDouble / baseRows)
      }.sum
      // current shape after the append: baseline + every appended delta
      // (list re-count, still k rows; lists dir is partition-pruned map
      // work, no shuffle beyond the k-row agg)
      val current = listRoots(spark, dir).map(spark.read.parquet(_))
        .reduce(_ unionByName _).groupBy("c").count()
        .collect().map(r => r.getLong(1))
      val imbalance =
        if (current.isEmpty) 1.0
        else current.max.toDouble / (current.sum.toDouble / current.length)
      val advise = drift > driftThreshold || imbalance > imbalanceThreshold
      if (advise) org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"IvfIndex.refresh($dir): drift=$drift imbalance=$imbalance — " +
          "centroids no longer fit the data; retrain and save")
      RefreshStats(deltaRows, drift, imbalance, advise)
    } finally assigned.unpersist()
  }

  /** Load the model half of a saved index. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val rows = spark.read.parquet(s"$dir/centroids")
      .orderBy("c").select("v").collect().map(rowToVec)
    Model(rows.toSeq)
  }

  /** Assign each vector its nearest-centroid list id — the shared
    * projection behind [[save]], [[refresh]] and the streaming
    * refresher.
    */
  private[graft] def assign(df: DataFrame, idCol: String, vecCol: String,
                            model: Model): DataFrame =
    df.select(col(idCol).as("base_id"), col(vecCol).as("base_v"))
      .withColumn("c", nearestCentroid(transform(col("base_v"), _.cast("double")), model))

  /** Every root directory holding inverted-file partitions: the base
    * `lists` plus any complete streaming delta dirs
    * (`delta/compact_<m>` newest first, then `delta/batch_<i>` past
    * it) written by `streaming.StreamIvfRefresh`. Marker-less or
    * file-less dirs (a crashed or all-empty batch) are skipped.
    */
  private[graft] def listRoots(spark: org.apache.spark.sql.SparkSession,
                               dir: String): Seq[String] = {
    val deltaPath = new org.apache.hadoop.fs.Path(s"$dir/delta")
    val fs = deltaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def complete(prefix: String): Seq[(Long, String)] =
      if (!fs.exists(deltaPath)) Nil
      else fs.listStatus(deltaPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
        .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        .filter { st =>
          val it = fs.listFiles(st.getPath, true)
          var found = false
          while (!found && it.hasNext)
            found = it.next().getPath.getName.endsWith(".parquet")
          found
        }
        .map(st => st.getPath.getName.stripPrefix(prefix).toLong -> st.getPath.toString)
        .sortBy(_._1)
    val compacts = complete("compact_")
    val floor = compacts.lastOption.map(_._1).getOrElse(-1L)
    val batches = complete("batch_").filter(_._1 > floor)
    (s"$dir/lists" +: compacts.lastOption.map(_._2).toSeq) ++ batches.map(_._2)
  }

  /** Top-k per query against a SAVED index: probe lists resolve to
    * partition directories, so the scan touches only the probed
    * fraction of the corpus — no assignment recompute, no full scan.
    */
  def topKIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
                  queries: DataFrame, idCol: String, vecCol: String,
                  k: Int = 5, nProbe: Int = 4): DataFrame = {
    GraftFunctions.register(spark)
    val model = load(spark, dir)
    // base lists plus any streaming delta roots; each root is its own
    // scan, so the isin partition filter below prunes every one
    val lists = listRoots(spark, dir).map(spark.read.parquet(_))
      .reduce(_ unionByName _)
    val probes = probeLists(queries, idCol, vecCol, model, nProbe)
    // static partition pruning: the probed list ids are model-sized
    // (≤ |queries|·nProbe), so an isin literal filter on the
    // partition column guarantees the scan reads only probed lists
    // (PartitionFilters asserted by spec)
    val probedCs = probes.select("c").distinct().collect().map(_.getInt(0)).toSeq
    val scored = lists
      .filter(col("c").isin(probedCs: _*))
      .join(broadcast(probes), Seq("c"))
      .filter(col("base_id") =!= col("query_id"))
      .withColumn("cosine", GraftFunctions.cosineFast(col("base_v"), col("query_v")))
      .select(col("query_id"), col("base_id"), col("cosine"))
    TopKPerKey(scored, Seq("query_id"),
      Seq("cosine" -> true, "base_id" -> false), k, rankCol = Some("rank"))
      .select(col("query_id"), col("base_id"), col("rank"), col("cosine"))
  }

  /** Each query exploded to its `nProbe` nearest centroid ids.
    * Shared with [[IvfPqIndex]] — the IVFADC composition probes the
    * same coarse lists.
    */
  private[operators] def probeLists(queries: DataFrame, idCol: String, vecCol: String,
                                    model: Model, nProbe: Int): DataFrame = {
    val qv = transform(col("query_v"), _.cast("double"))
    val sims = array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct((-GraftFunctions.cosineFast(qv, centroidLit(c))).as("ns"), lit(i).as("i"))
    }: _*)
    queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
      .withColumn("ranked", slice(array_sort(sims), 1, nProbe))
      .select(col("query_id"), col("query_v"),
        explode(transform(col("ranked"), r => r.getField("i"))).as("c"))
  }

  /** Top-k per query probing `nProbe` centroid lists (assignment
    * computed on the fly; use [[save]]/[[topKIndexed]] to amortize it).
    */
  def topK(base: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           model: Model, k: Int = 5, nProbe: Int = 4): DataFrame = {
    GraftFunctions.register(base.sparkSession)
    val b = base.select(col(idCol).as("base_id"), col(vecCol).as("base_v"))
      .withColumn("c", nearestCentroid(transform(col("base_v"), _.cast("double")), model))
    val probes = probeLists(queries, idCol, vecCol, model, nProbe)
    val scored = b.join(broadcast(probes), Seq("c"))
      .filter(col("base_id") =!= col("query_id"))
      .withColumn("cosine", GraftFunctions.cosineFast(col("base_v"), col("query_v")))
      .select(col("query_id"), col("base_id"), col("cosine"))
    TopKPerKey(scored, Seq("query_id"),
      Seq("cosine" -> true, "base_id" -> false), k, rankCol = Some("rank"))
      .select(col("query_id"), col("base_id"), col("rank"), col("cosine"))
  }
}

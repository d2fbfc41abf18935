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

  /** Per-group embedding centroids (mean vector + member count) — the
    * cluster-summary primitive under semantic dedup reporting, drift
    * monitoring of embedding spaces, and coarse IVF-style routing.
    *
    * Shape at 100 TB: posexplode to (group, pos, value) rows, ONE hash
    * aggregate on (group, pos) — map-side partials collapse each scan
    * partition to |groups|·dim rows before the exchange, so the
    * shuffle carries per-partition partial sums, never vectors — then
    * a model-sized (|groups|·dim) re-assembly into ordered arrays.
    * Means are rounded to 6 decimals for engine portability. For
    * ragged inputs the mean is per-position over present elements and
    * `n` is the largest per-position count.
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame = {
    val m = groupCentroidsLong(df, groupCol, vecCol)
    m.groupBy(col(groupCol))
      .agg(max(col("n")).cast("bigint").as("n"),
        transform(
          sort_array(collect_list(struct(col("pos"), col("mean")))),
          s => s.getField("mean")).as("centroid"))
  }

  /** Long form of [[groupCentroids]]: one row per (group, pos) with the
    * per-position `mean` (round-6 double) and the per-position member
    * count `n` — the exact intermediate the array form re-assembles.
    * This is the shape external comparators can hash (flat scalar
    * columns, no array), and the shape downstream exact-decimal algebra
    * (e.g. the label-similarity matrix) consumes directly.
    */
  def groupCentroidsLong(df: DataFrame, groupCol: String, vecCol: String)
      : DataFrame = {
    val ex = df.select(col(groupCol),
      posexplode(col(vecCol)).as(Seq("pos", "v")))
    ex.groupBy(col(groupCol), col("pos").cast("bigint").as("pos"))
      .agg(round(avg(col("v").cast("double")), 6).as("mean"),
        count(lit(1)).cast("bigint").as("n"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the k nearest neighbors by cosine whose `labelCol`
    * DIFFERS from the query's — the near-misses a contrastive or
    * retrieval model learns the most from (the easy in-label
    * positives and the distant negatives both carry little
    * gradient). Same plan shape as [[bruteForceTopK]]: the query
    * side broadcasts, the 100 TB base never moves, and per-query
    * selection goes through the [[TopKPerKey]] partial+final heap.
    */
  def hardNegatives(base: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    k: Int = 5): DataFrame = {
    GraftFunctions.register(base.sparkSession)
    val b = base.select(col(idCol).as("base_id"), col(vecCol).as("base_v"),
      col(labelCol).as("base_label"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"),
      col(labelCol).as("query_label"))
    val scored = b.crossJoin(broadcast(q))
      .filter(col("base_id") =!= col("query_id") &&
        col("base_label") =!= col("query_label"))
      .withColumn("cosine", GraftFunctions.cosineFast(col("base_v"), col("query_v")))
    TopKPerKey(
      scored.select(col("query_id"), col("query_label"), col("base_id"),
        col("base_label"), col("cosine")),
      Seq("query_id"), Seq("cosine" -> true, "base_id" -> false), k,
      rankCol = Some("rank"))
      .select(col("query_id"), col("query_label"), col("rank"),
        col("base_id").as("negative_id"), col("base_label").as("negative_label"),
        col("cosine"))
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

  // ------------------- int8 quantized corpus -------------------

  /** Symmetric per-vector int8 quantization of an embedding column:
    * `scale = maxAbs / 127`, `q[i] = round(v[i] / scale)` — the
    * standard 4x (float32) memory/scan reduction for an ANN corpus at
    * 100 TB, at the cost of ≤ scale/2 absolute error per component.
    * Emits `<vec>_q` (array<tinyint>) + `<vec>_scale` (double);
    * all-column passthrough. Fully codegen'd column math (transform/
    * aggregate), no shuffle — runs at scan speed.
    */
  def quantize(df: DataFrame, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), _.cast("double"))
    val maxAbs = aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x)))
    val scale = when(maxAbs > 0.0, maxAbs / 127.0).otherwise(lit(1.0))
    df.withColumn(s"${vecCol}_scale", scale)
      .withColumn(s"${vecCol}_q",
        transform(v, x => round(x / col(s"${vecCol}_scale")).cast("tinyint")))
  }

  /** Dequantized double vector: `q[i] * scale`. */
  def dequantize(qCol: org.apache.spark.sql.Column,
                 scaleCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(qCol, x => x.cast("double") * scaleCol)

  /** Brute-force top-k over a QUANTIZED corpus: base vectors arrive as
    * (int8 array, scale) — a quarter of the float corpus's bytes per
    * scan — and dequantize on the fly inside the codegen'd cosine.
    * Queries stay full precision (they are broadcast and tiny).
    * Recall vs the exact [[bruteForceTopK]] is spec-bounded.
    */
  def bruteForceTopKQuantized(baseQ: DataFrame, queries: DataFrame,
                              idCol: String, vecCol: String,
                              k: Int = 5): DataFrame = {
    GraftFunctions.register(baseQ.sparkSession)
    val b = baseQ.select(col(idCol).as("base_id"),
      dequantize(col(s"${vecCol}_q"), col(s"${vecCol}_scale")).as("base_v"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_v"))
    val scored = b.crossJoin(broadcast(q))
      .filter(col("base_id") =!= col("query_id"))
      .withColumn("cosine", GraftFunctions.cosineFast(col("base_v"), col("query_v")))
    topKPerQuery(scored, k)
  }

  /** JVM-side cosine over float vectors (double accumulation), the
    * greedy re-ranker's candidate-candidate metric. Zero-norm → 0.
    */
  private[graft] def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** MMR diversified top-k (Maximal Marginal Relevance, Carbonell &
    * Goldstein SIGIR '98) — retrieval that penalizes redundancy:
    * greedily pick argmax λ·sim(q,c) − (1−λ)·max_{s∈selected}
    * sim(c,s), so the result set trades pure relevance for coverage.
    * The near-dup-aware retrieval / diverse-exemplar-sampling
    * primitive: top-k alone returns k copies of the same cluster.
    *
    * Shape at 100 TB: stage 1 is the existing brute-force scan
    * (queries broadcast, base never moves, TopKPerKey partial+final
    * heap) cut to `m` candidates per query; stage 2 re-fetches the m
    * candidate vectors by ONE equi-join and runs the greedy selection
    * per query group — O(m²·dim) on m≤`maxCandidates` rows, the one
    * genuinely iterative-argmax step SQL operators cannot express
    * (the documented mapPartitions-tier exception). Ties break on
    * base_id; candidate order is pinned by stage-1 rank, so the
    * output is partitioning-invariant.
    *
    * @return (query_id, mmr_rank, base_id, relevance, mmr_score)
    */
  def mmrTopK(base: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String,
              k: Int = 5, m: Int = 20, lambda: Double = 0.7,
              maxCandidates: Int = 1000): DataFrame = {
    require(k >= 1 && m >= k,
      s"mmrTopK: need m >= k >= 1, got k=$k m=$m")
    require(m <= maxCandidates,
      s"mmrTopK: m=$m exceeds maxCandidates=$maxCandidates — the greedy " +
        "re-rank buffers m vectors per query group")
    require(lambda >= 0.0 && lambda <= 1.0,
      s"mmrTopK: lambda must be in [0,1], got $lambda")
    val spark = base.sparkSession
    import spark.implicits._
    val cand = bruteForceTopK(base, queries, idCol, vecCol, m)
    val withVec = cand.join(
      base.select(col(idCol).cast("long").as("base_id"),
        col(vecCol).as("__bv")), Seq("base_id"))
    val ds = withVec.select(col("query_id").cast("long").as("_1"),
        col("base_id").cast("long").as("_2"), col("rank").cast("int").as("_3"),
        col("cosine").cast("double").as("_4"), col("__bv").as("_5"))
      .as[(Long, Long, Int, Double, Array[Float])]
    ds.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val cands = it.toArray.sortBy(_._3)
      val picked = new Array[Boolean](cands.length)
      val selected = scala.collection.mutable.ArrayBuffer[Int]()
      val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Double, Double)]()
      var r = 1
      while (selected.length < math.min(k, cands.length)) {
        var best = -1; var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < cands.length) {
          if (!picked(i)) {
            // max similarity to anything already selected — kept
            // signed (an anticorrelated candidate's penalty is
            // negative, i.e. a bonus, per the published formula);
            // first pick has no penalty term
            var red = if (selected.isEmpty) 0.0 else Double.NegativeInfinity
            selected.foreach { j =>
              val s = cosineLocal(cands(i)._5, cands(j)._5)
              if (s > red) red = s
            }
            val sc = lambda * cands(i)._4 - (1.0 - lambda) * red
            if (sc > bestScore ||
                (sc == bestScore && (best < 0 || cands(i)._2 < cands(best)._2)))
              { best = i; bestScore = sc }
          }
          i += 1
        }
        picked(best) = true; selected += best
        out += ((qid, r, cands(best)._2, cands(best)._4,
          math.rint(bestScore * 1e6) / 1e6))
        r += 1
      }
      out.iterator
    }.toDF("query_id", "mmr_rank", "base_id", "relevance", "mmr_score")
  }
}

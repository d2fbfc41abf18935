package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance weighting for training-data selection (SURVEY §2c row
  * 61) — the DSIR shape (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw
  * document by the log-likelihood ratio of a TARGET distribution
  * over a RAW distribution, both modeled as bags of hashed n-grams,
  * then resample with weights ∝ exp(score).
  *
  * Why it scales: both models are B-bucket histograms (B = a few
  * thousand), so the "model" is a broadcast-sized weight table no
  * matter the corpus size. The pipeline is: one explode+hash
  * aggregation to bucket counts (target and raw counted in the SAME
  * pass via a conditional aggregate — one scan, map-side combined),
  * then scoring = broadcast-join of per-doc n-gram buckets to the
  * weight table + per-doc sum. Nothing data-sized crosses an
  * exchange except the (doc, bucket) stream, which is hash-partial
  * aggregated; no driver state at all.
  *
  * Hashing is the engine-portable md5 bucket (same trick as
  * [[Sampling.portableBucket]]), so the whole scoring query is
  * reproducible in DuckDB and oracle-checked end to end — not a
  * rows-only operator.
  *
  * Resampling reuses [[Sampling.weightedSample]] (A-ES without
  * replacement) with weight exp(score / temperature).
  */
object Dsir {

  val DefaultBuckets = 4096

  /** Engine-portable n-gram bucket: md5 of the n-gram string, first
    * 8 hex chars as an integer, mod `buckets`.
    */
  def bucketOf(ngram: Column, buckets: Int): Column =
    conv(substring(md5(ngram.cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Unigrams + bigrams of the whitespace token stream, as one
    * array column (no strings survive past the explode+hash).
    */
  def ngrams(textCol: Column): Column = {
    val toks = filter(split(textCol, "\\s+", -1), w => length(w) > 0)
    val n = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(
      slice(toks, lit(1), n),
      slice(toks, lit(2), n),
      (a, b) => concat_ws(" ", a, b))
    concat(toks, bigrams)
  }

  /** (doc, bucket, occurrence count) — ONE corpus scan + one
    * map-side-combined aggregation. Everything downstream (the
    * weight model AND the scores) derives from this frame, so the
    * n-gram explode + hash runs exactly once; the canonical subtree
    * is shared, so the executed plan reuses one scan stage.
    */
  private def docBucketCounts(corpus: DataFrame, idCol: String,
                              textCol: String, targetPred: Column,
                              buckets: Int): DataFrame =
    Fanout.widen(
        corpus.select(col(idCol).as("__doc"), targetPred.as("__t"),
          col(textCol).as("__text")))
      .select(col("__doc"), col("__t"),
        explode(ngrams(col("__text"))).as("__g"))
      .select(col("__doc"), col("__t"), bucketOf(col("__g"), buckets).as("__b"))
      // semantics-neutral (buckets are never null) but plan-critical:
      // the scoring join infers isnotnull(__b) on ITS copy of this
      // subtree only; without the same filter here the two consumers
      // stop canonicalizing identically and AQE stage reuse splits
      // into a second full corpus explode+hash (the text_drift
      // lesson; gated by PlanShapeSpec's executed-scan count)
      .where(col("__b").isNotNull)
      .groupBy(col("__doc"), col("__t"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))

  private def weightsOf(db: DataFrame, buckets: Int): DataFrame = {
    val counts = db.groupBy(col("__b"))
      .agg(sum(col("__cnt")).as("c_r"),
        sum(when(col("__t"), col("__cnt")).otherwise(0L)).as("c_t"))
    val totals = counts.agg(sum(col("c_r")).as("n_r"),
      sum(col("c_t")).as("n_t"))
    counts.crossJoin(broadcast(totals))
      .select(col("__b").as("bucket"),
        (log((col("c_t") + 1) / (col("n_t") + buckets)) -
          log((col("c_r") + 1) / (col("n_r") + buckets))).as("w"))
  }

  /** The broadcastable weight table: for every bucket,
    * w = ln p_target(bucket) - ln p_raw(bucket), both add-one
    * smoothed over `buckets`. Target and raw counts come from ONE
    * aggregation pass (a doc is wholly target or wholly raw), so the
    * model costs a single corpus scan.
    */
  def importanceWeights(corpus: DataFrame, idCol: String, textCol: String,
                        targetPred: Column,
                        buckets: Int = DefaultBuckets): DataFrame =
    weightsOf(docBucketCounts(corpus, idCol, textCol, targetPred, buckets),
      buckets)

  /** Per-document importance score: sum of bucket weights over the
    * document's n-gram occurrences (weight × per-doc occurrence
    * count). The weight table broadcasts (≤ `buckets` rows), so
    * scoring is a broadcast join + one hash aggregation over the
    * SAME (doc, bucket) frame the model was trained from — the
    * corpus is scanned once.
    */
  def importanceScores(corpus: DataFrame, idCol: String, textCol: String,
                       targetPred: Column,
                       buckets: Int = DefaultBuckets): DataFrame = {
    val db = docBucketCounts(corpus, idCol, textCol, targetPred, buckets)
    db.join(broadcast(weightsOf(db, buckets)), col("__b") === col("bucket"))
      .groupBy(col("__doc").as(idCol))
      .agg(round(sum(col("w") * col("__cnt")), 6).as("score"))
  }

  /** Importance resampling: k docs without replacement, weight
    * exp(score / temperature) — A-ES via [[Sampling.weightedSample]],
    * deterministic and engine-portable like the rest of the sampling
    * family. Higher temperature flattens toward uniform.
    */
  def resample(scores: DataFrame, idCol: String, k: Int,
               temperature: Double = 1.0): DataFrame =
    Sampling.weightedSample(
      scores.withColumn("__w", exp(col("score") / temperature)),
      idCol, "__w", k).drop("__w")
}

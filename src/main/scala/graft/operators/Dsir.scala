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

  /** (doc, bucket) stream: one row per n-gram occurrence. */
  private def docBuckets(corpus: DataFrame, idCol: String, textCol: String,
                         buckets: Int, keep: Seq[Column]): DataFrame =
    corpus.select(keep :+ explode(ngrams(col(textCol))).as("__g"): _*)
      .withColumn("__b", bucketOf(col("__g"), buckets))
      .drop("__g")

  /** The broadcastable weight table: for every bucket,
    * w = ln p_target(bucket) - ln p_raw(bucket), both add-one
    * smoothed over `buckets`. Target and raw counts come from ONE
    * aggregation pass (conditional count), so the model costs a
    * single corpus scan.
    */
  def importanceWeights(corpus: DataFrame, idCol: String, textCol: String,
                        targetPred: Column,
                        buckets: Int = DefaultBuckets): DataFrame = {
    val bs = docBuckets(corpus, idCol, textCol, buckets,
      Seq(targetPred.as("__t")))
    val counts = bs.groupBy(col("__b"))
      .agg(count(lit(1)).as("c_r"),
        count_if(col("__t")).as("c_t"))
    val totals = counts.agg(sum(col("c_r")).as("n_r"),
      sum(col("c_t")).as("n_t"))
    counts.crossJoin(broadcast(totals))
      .select(col("__b").as("bucket"),
        (log((col("c_t") + 1) / (col("n_t") + buckets)) -
          log((col("c_r") + 1) / (col("n_r") + buckets))).as("w"))
  }

  /** Per-document importance score: sum of bucket weights over the
    * document's n-grams. The weight table broadcasts (≤ `buckets`
    * rows), so scoring is a scan-side join + one hash aggregation.
    */
  def importanceScores(corpus: DataFrame, idCol: String, textCol: String,
                       targetPred: Column,
                       buckets: Int = DefaultBuckets): DataFrame = {
    val weights = importanceWeights(corpus, idCol, textCol, targetPred,
      buckets)
    docBuckets(corpus, idCol, textCol, buckets, Seq(col(idCol)))
      .join(broadcast(weights), col("__b") === col("bucket"))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
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

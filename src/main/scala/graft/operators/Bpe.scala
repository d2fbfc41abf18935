package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training + tokenization
  * (SURVEY §2c row 60) — the tokenizer-construction step of a
  * training-data pipeline, built the way it scales:
  *
  * BPE does NOT train on the raw corpus; it trains on the WORD
  * FREQUENCY TABLE (Sennrich et al. 2016). So the distributed part
  * is one scan + one hash aggregation — corpus to (word, count),
  * map-side combined, model-sized output by Heaps' law — and the
  * merge loop runs on the driver over that dictionary, touching
  * vocabulary entries only, never data rows. At 100 TB the word
  * table for a tokenizer corpus is still MBs: the collect here is
  * model-sized by construction and additionally capped at
  * `maxWords` most-frequent words (a standard tokenizer-training
  * truncation, documented not silent: the model records how many
  * words were kept vs seen).
  *
  * Tokenization broadcasts the ranked merge list and encodes per
  * partition with a word→tokens memo: Zipf means the memo hit rate
  * approaches 1, so per-row cost is a hash lookup, not a merge loop.
  * Nothing data-sized ever crosses an exchange or lands on the
  * driver.
  *
  * Determinism: merge selection breaks count ties lexicographically,
  * so the same corpus always yields the same vocabulary — required
  * for the driver's repeated-run row hashing and for training-data
  * reproducibility.
  */
object Bpe {

  /** End-of-word sentinel appended as a separate symbol; words are
    * assumed not to contain it (true of whitespace-split text).
    */
  val EndOfWord = "</w>"

  /** A trained tokenizer: `merges` ranked by training order. */
  case class Model(merges: Seq[(String, String)],
                   wordsKept: Long, wordsSeen: Long) {
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap

    /** Encode one word by applying merges in rank order. */
    def encodeWord(word: String): Array[String] = {
      var syms = (word.map(_.toString) :+ EndOfWord).toArray
      var done = false
      while (!done && syms.length > 1) {
        var best = Int.MaxValue
        var at = -1
        var i = 0
        while (i < syms.length - 1) {
          val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < best) { best = r; at = i }
          i += 1
        }
        if (at < 0) done = true
        else {
          val merged = syms(at) + syms(at + 1)
          syms = (syms.take(at) :+ merged) ++ syms.drop(at + 2)
        }
      }
      syms
    }
  }

  /** Train `numMerges` BPE merges on the corpus's word-frequency
    * table. One distributed aggregation; the merge loop is
    * driver-side over the (capped) dictionary.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 1 << 20): Model = {
    val counts = df
      .select(explode(split(col(textCol), "\\s+", -1)).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val seen = counts.count()
    val dict: Array[(Array[String], Long)] = counts
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .select(col("w"), col("c"))
      .as[(String, Long)](Encoders.product[(String, Long)])
      .collect()
      .map { case (w, c) => ((w.map(_.toString) :+ EndOfWord).toArray, c) }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    val words: Array[Array[String]] = dict.map(_._1)
    val freqs: Array[Long] = dict.map(_._2)
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      // pair frequencies over the dictionary, weighted by word count
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi)
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + freqs(wi))
          i += 1
        }
        wi += 1
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // deterministic: max count, ties broken lexicographically
        val (bestPair, _) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += bestPair
        val mergedSym = bestPair._1 + bestPair._2
        wi = 0
        while (wi < words.length) {
          val syms = words(wi)
          if (syms.length > 1) {
            val out = mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == bestPair._1 &&
                  syms(i + 1) == bestPair._2) {
                out += mergedSym; i += 2
              } else { out += syms(i); i += 1 }
            }
            words(wi) = out.toArray
          }
          wi += 1
        }
        iter += 1
      }
    }
    Model(merges.toSeq, dict.length.toLong, seen)
  }

  /** Persist a trained model: one parquet of rank-ordered merges plus
    * a rank=-1 metadata row (kept/seen word counts). A tokenizer is
    * a build-once/ship-everywhere artifact — training jobs save it,
    * every downstream tokenization job loads the model-sized file.
    */
  def save(model: Model, spark: org.apache.spark.sql.SparkSession,
           path: String): Unit = {
    val rows = (-1, "", "", model.wordsKept, model.wordsSeen) +:
      model.merges.zipWithIndex.map { case ((a, b), r) =>
        (r, a, b, model.wordsKept, model.wordsSeen)
      }
    spark.createDataFrame(rows)
      .toDF("rank", "left", "right", "words_kept", "words_seen")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select(col("rank"), col("left"), col("right"),
        col("words_kept"), col("words_seen"))
      .as[(Int, String, String, Long, Long)](
        Encoders.product[(Int, String, String, Long, Long)])
      .collect()
    val meta = rows.find(_._1 == -1).getOrElse(throw new IllegalStateException(
      s"BPE model at $path has no metadata row"))
    val merges = rows.filter(_._1 >= 0).sortBy(_._1)
      .map(r => (r._2, r._3)).toSeq
    Model(merges, meta._4, meta._5)
  }

  /** Tokenize the corpus with a trained model: (id, tokens array).
    * Broadcast merges + per-partition word memo; the map is a pure
    * projection — no shuffle, nothing to the driver.
    */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               model: Model): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val enc = Encoders.product[(Long, Seq[String])]
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)](Encoders.product[(Long, String)])
      .mapPartitions { it =>
        val m = bc.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val toks = text.split("\\s+").iterator.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, m.encodeWord(w)))
            .toSeq
          (id, toks)
        }
      }(enc)
      .toDF(idCol, "tokens")
  }
}

package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** UNIGRAM LANGUAGE-MODEL tokenizer training + tokenization (Kudo
  * 2018, the SentencePiece unigram algorithm) — the second member of
  * the published-pipeline tokenizer family next to [[Bpe]]: where BPE
  * GROWS a vocabulary bottom-up by merging, the unigram LM SHRINKS a
  * large seed vocabulary top-down by EM + pruning, and tokenization
  * is the Viterbi-best segmentation under the learned piece
  * log-probabilities.
  *
  * Scale shape — identical to [[Bpe.train]] (the reference for this
  * contract): the tokenizer trains on the WORD-FREQUENCY TABLE, not
  * the corpus. The distributed part is one scan + one hash
  * aggregation (map-side combined, model-sized by Heaps' law, capped
  * at `maxWords` most-frequent words — documented, not silent); the
  * seed enumeration, EM iterations, and pruning all run on the
  * driver over vocabulary entries, never data rows. Tokenization
  * broadcasts the piece table and Viterbi-decodes per partition with
  * a word→pieces memo (Zipf: memo hit rate → 1).
  *
  * DETERMINISM (the Bpe convention — required for repeated-run row
  * hashing and training-data reproducibility): hard-EM (Viterbi
  * E-step — expected counts are integer word frequencies, no
  * float-sum order sensitivity), a FIXED iteration count (no float
  * convergence test to flip across runs), seed/prune orderings that
  * break count ties lexicographically, and Viterbi ties broken by
  * FEWER pieces then lexicographically-first segmentation.
  *
  * Single characters are never pruned, so any word over the seen
  * alphabet segments totally; an unseen character is emitted as its
  * own piece (the standard UNK-char fallback, stated).
  */
object UnigramLm {

  /** A trained model: pieces with log-probabilities (natural log of
    * count/total from the final M-step; single-char pieces that end
    * with zero count carry the UNK floor).
    */
  case class Model(pieces: Seq[(String, Double)],
                   wordsKept: Long, wordsSeen: Long) {
    /** Score floor for unseen characters — below every real piece. */
    val UnkScore: Double = -1e3

    lazy val scores: Map[String, Double] = pieces.toMap
    lazy val maxLen: Int =
      if (pieces.isEmpty) 1 else pieces.map(_._1.length).max

    /** Viterbi-best segmentation of one word: max total log-prob,
      * ties → fewer pieces, then lexicographically-first piece at
      * the earliest difference (deterministic).
      */
    def encodeWord(word: String): Array[String] = {
      val n = word.length
      if (n == 0) return Array.empty
      // best(i): (score, pieceCount, startOfLastPiece) ending at i
      val score = Array.fill(n + 1)(Double.NegativeInfinity)
      val nPieces = Array.fill(n + 1)(Int.MaxValue)
      val back = Array.fill(n + 1)(-1)
      score(0) = 0.0; nPieces(0) = 0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        // also allow the single char at i-1 as UNK when nothing hits
        while (j < i) {
          if (score(j) != Double.NegativeInfinity) {
            val piece = word.substring(j, i)
            val s = scores.get(piece) match {
              case Some(lp) => lp
              case None if i - j == 1 => UnkScore
              case None => Double.NaN
            }
            if (!s.isNaN) {
              val cand = score(j) + s
              val candN = nPieces(j) + 1
              val better = cand > score(i) ||
                (cand == score(i) && (candN < nPieces(i) ||
                  (candN == nPieces(i) && back(i) >= 0 && j < back(i))))
              if (better) { score(i) = cand; nPieces(i) = candN; back(i) = j }
            }
          }
          j += 1
        }
        i += 1
      }
      val out = mutable.ArrayBuffer.empty[String]
      var at = n
      while (at > 0) { val j = back(at); out += word.substring(j, at); at = j }
      out.reverseIterator.toArray
    }
  }

  /** Train a unigram-LM vocabulary of (at most) `vocabSize` pieces on
    * the corpus's word-frequency table.
    *
    * @param vocabSize   target piece count (single chars always kept,
    *                    so the floor is the alphabet size)
    * @param maxPieceLen seed substring length cap (SentencePiece's
    *                    max_sentencepiece_length idea)
    * @param emIters     FIXED hard-EM iterations between prunes
    * @param maxSeedPieces cap on the seed vocabulary (top by count,
    *                    ties lexicographic — documented truncation)
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
            maxWords: Int = 1 << 20, maxPieceLen: Int = 8,
            emIters: Int = 2, maxSeedPieces: Int = 1 << 18): Model = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val counts = df
      .select(explode(split(col(textCol), "\\s+", -1)).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val seen = counts.count()
    val dict: Array[(String, Long)] = counts
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .as[(String, Long)](Encoders.product[(String, Long)])
      .collect()

    // seed: every substring up to maxPieceLen, count = freq-weighted
    // occurrences; single chars ALWAYS survive
    val seedCounts = mutable.HashMap.empty[String, Long]
    for ((w, f) <- dict; i <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - i)) {
      val p = w.substring(i, i + l)
      seedCounts.update(p, seedCounts.getOrElse(p, 0L) + f)
    }
    val chars = seedCounts.keysIterator.filter(_.length == 1).toSet
    val multi = seedCounts.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, maxSeedPieces - chars.size))
    var active: mutable.LinkedHashMap[String, Long] =
      mutable.LinkedHashMap((chars.toSeq.sorted.map(c =>
        c -> seedCounts(c)) ++ multi): _*)

    def emRound(): mutable.LinkedHashMap[String, Long] = {
      val total = math.max(1.0, active.valuesIterator.map(_.toDouble).sum)
      // zero-count pieces (chars a multi currently covers) take the
      // finite UNK floor, not log(0) = −∞ — they must stay REACHABLE
      // for the Viterbi when a later prune re-exposes their char
      val logp = active.map { case (p, c) =>
        p -> (if (c > 0) math.log(c.toDouble / total) else -1e3) }.toMap
      val m = Model(logp.toSeq.sortBy(_._1), dict.length.toLong, seen)
      val next = mutable.HashMap.empty[String, Long]
      for ((w, f) <- dict; piece <- m.encodeWord(w))
        next.update(piece, next.getOrElse(piece, 0L) + f)
      // rebuild in deterministic order: chars (alphabetic) first with
      // a +0 floor (unused chars keep count 0 but stay), then multis
      // by (count desc, piece asc)
      val multis = next.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }
      mutable.LinkedHashMap(
        (chars.toSeq.sorted.map(c => c -> next.getOrElse(c, 0L))
          ++ multis): _*)
    }

    // EM + prune until the vocabulary fits: each cycle re-estimates
    // counts by Viterbi (emIters rounds) then drops the weakest
    // multi-char pieces (count asc, piece desc — lexicographically
    // larger goes first on ties) down to the prune step
    var guard = 0
    // stop at the alphabet floor: single chars are never pruned, so a
    // vocabSize below the alphabet size settles to chars-only
    while (active.size > vocabSize &&
        active.keysIterator.exists(_.length > 1) && guard < 64) {
      for (_ <- 0 until emIters) active = emRound()
      val multis = active.iterator.filter(_._1.length > 1).toSeq
      val nChars = active.size - multis.size
      val keepMulti = math.max(0, vocabSize - nChars)
      // drop at most 25% of multis per cycle (SentencePiece's
      // shrinking_factor idea) so counts re-settle between prunes
      val target = math.max(keepMulti, (multis.size * 3) / 4)
      val kept = multis.sortBy { case (p, c) => (-c, p) }.take(target)
      active = mutable.LinkedHashMap(
        (active.iterator.filter(_._1.length == 1).toSeq ++ kept): _*)
      guard += 1
    }
    // final count settle + probabilities
    for (_ <- 0 until emIters) active = emRound()
    val total = math.max(1.0, active.valuesIterator.map(_.toDouble).sum)
    val unk = -1e3
    val pieces = active.iterator.map { case (p, c) =>
      p -> (if (c > 0) math.log(c.toDouble / total) else unk)
    }.toSeq.sortBy(_._1)
    Model(pieces, dict.length.toLong, seen)
  }

  /** Persist: one parquet of (piece, logp) plus a metadata row
    * (piece = "", the kept/seen word counts) — the [[Bpe.save]]
    * convention.
    */
  def save(model: Model, spark: org.apache.spark.sql.SparkSession,
           path: String): Unit = {
    val rows = ("", 0.0, model.wordsKept, model.wordsSeen) +:
      model.pieces.map { case (p, lp) =>
        (p, lp, model.wordsKept, model.wordsSeen) }
    spark.createDataFrame(rows)
      .toDF("piece", "logp", "words_kept", "words_seen")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select(col("piece"), col("logp"), col("words_kept"),
        col("words_seen"))
      .as[(String, Double, Long, Long)](
        Encoders.product[(String, Double, Long, Long)])
      .collect()
    val meta = rows.find(_._1 == "").getOrElse(
      throw new IllegalStateException(
        s"unigram model at $path has no metadata row"))
    Model(rows.filter(_._1.nonEmpty).map(r => (r._1, r._2)).toSeq
      .sortBy(_._1), meta._3, meta._4)
  }

  /** Tokenize the corpus: (id, pieces array) — broadcast model +
    * per-partition word memo, a pure projection (the [[Bpe.tokenize]]
    * shape: no shuffle, nothing to the driver).
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
      .toDF(idCol, "pieces")
  }
}

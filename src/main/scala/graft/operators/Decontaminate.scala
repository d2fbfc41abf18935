package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._
import graft.plans.GraftFunctions

/** Benchmark decontamination — the training-pipeline step that finds
  * corpus documents overlapping an evaluation/benchmark set by shared
  * word n-grams, so they can be dropped before training.
  *
  * Shape: the corpus side explodes to (doc, shingle-hash) postings
  * with the doc's shingle count riding along; the probe side reduces
  * to its DISTINCT shingle hashes (benchmark sets are small — the set
  * broadcasts). One left join + one aggregate per doc; no strings
  * shuffle (codegen [[graft.plans.ShingleHash64]] identities), zero
  * hits still produce a row.
  */
object Decontaminate {

  /** Per corpus document: total distinct shingles, how many appear
    * anywhere in `probes`, and the contaminated fraction. Documents
    * with fewer than n tokens (no shingles) are excluded — they
    * cannot overlap.
    */
  /** Distinct shingle hashes of the probe/benchmark set — compute it
    * once (and cache) when probing repeatedly, e.g. per microbatch in
    * [[graft.streaming.StreamDecontaminate]].
    */
  def probeSet(probes: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    GraftFunctions.register(probes.sparkSession)
    probes.select(explode(
        GraftFunctions.shingleFast(wsTokens(col(textCol)), n)).as("sh"))
      .distinct()
      .withColumn("hit", lit(1L))
  }

  def contamination(corpus: DataFrame, probes: DataFrame,
                    idCol: String, textCol: String, n: Int = 3): DataFrame =
    contaminationAgainst(corpus, probeSet(probes, textCol, n), idCol, textCol, n)

  /** As [[contamination]], against a pre-computed [[probeSet]]. */
  def contaminationAgainst(corpus: DataFrame, probeShingles: DataFrame,
                           idCol: String, textCol: String, n: Int = 3): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val posting = corpus.select(col(idCol).as("doc"),
        GraftFunctions.shingleFast(wsTokens(col(textCol)), n).as("sh_hashes"))
      .select(col("doc"), size(col("sh_hashes")).as("n_sh"),
        explode(col("sh_hashes")).as("sh"))
    posting.join(broadcast(probeShingles), Seq("sh"), "left")
      .groupBy(col("doc").as(idCol), col("n_sh").cast("bigint").as("n_shingles"))
      .agg(coalesce(sum(col("hit")), lit(0L)).cast("bigint").as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
  }

  /** Corpus minus documents whose contamination is >= `maxFraction`. */
  def decontaminate(corpus: DataFrame, probes: DataFrame,
                    idCol: String, textCol: String,
                    maxFraction: Double = 0.2, n: Int = 3): DataFrame =
    decontaminateAgainst(corpus, probeSet(probes, textCol, n),
      idCol, textCol, maxFraction, n)

  /** [[contamination]] for probe sets too large to broadcast exactly:
    * a Bloom filter over the probe shingle hashes (built distributed,
    * shipped as ONE broadcast variable, ~1.2 bytes/shingle at 1% fpp)
    * prefilters corpus postings inside whole-stage codegen, so the
    * exact-verify join shuffles only the might-contain candidates —
    * O(contaminated tail + fpp x corpus), not O(every posting in the
    * corpus). False positives cannot leak into the result: surviving
    * candidates are still joined against the exact probe set (which
    * shuffles at O(probe), never broadcasts). Per-doc totals come from
    * a separate explode-free pass, so zero-hit documents keep their
    * row exactly as in the broadcast form.
    */
  def contaminationBloom(corpus: DataFrame, probeShingles: DataFrame,
                         idCol: String, textCol: String, n: Int = 3,
                         fpp: Double = 0.01): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val spark = corpus.sparkSession
    val expected = math.max(1L, probeShingles.count())
    val filter = probeShingles.stat.bloomFilter("sh", expected, fpp)
    val bc = spark.sparkContext.broadcast(filter)
    def mightContain(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.plans.BloomMightContainLong(
          org.apache.spark.sql.graft.ColumnBridge.expression(c), bc))

    val withSh = corpus.select(col(idCol).as("doc"),
      GraftFunctions.shingleFast(wsTokens(col(textCol)), n).as("sh_hashes"))
    val totals = withSh
      .select(col("doc"), size(col("sh_hashes")).cast("bigint").as("n_shingles"))
      .filter(col("n_shingles") > 0)
    val candidates = withSh
      .select(col("doc"), explode(col("sh_hashes")).as("sh"))
      .filter(mightContain(col("sh")))
    val hits = candidates
      .join(probeShingles.select("sh"), Seq("sh"), "left_semi")
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("bigint").as("n_contaminated"))
    totals.join(hits, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles").cast("double"))
  }

  /** As [[decontaminate]], against a pre-computed [[probeSet]]. */
  def decontaminateAgainst(corpus: DataFrame, probeShingles: DataFrame,
                           idCol: String, textCol: String,
                           maxFraction: Double = 0.2, n: Int = 3): DataFrame = {
    val dirty = contaminationAgainst(corpus, probeShingles, idCol, textCol, n)
      .filter(col("contamination") >= maxFraction)
      .select(col(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** SURGICAL decontamination: instead of dropping a contaminated
    * document, remove exactly the token spans covered by a benchmark
    * window and keep the remainder — the span-removal regime of Lee
    * et al. 2022 applied to eval overlap, for documents that quote a
    * benchmark but are otherwise good training text.
    *
    * Shape: positional window hashes ([[graft.plans.ShingleHashPos64]]
    * — index = token offset) explode to (doc, offset, hash) postings;
    * a broadcast probe-set join keeps only the HITS (rare at any
    * scale — that is the premise of decontamination); hit offsets
    * fold back per doc (model-sized lists) and a broadcast join
    * returns them to the corpus scan, where higher-order functions
    * drop the covered tokens. Every output row is rebuilt from one
    * corpus scan + one scan over hit offsets; no text ever shuffles.
    *
    * Output: one row per corpus doc — the cleaned text (single-space
    * rejoined), tokens removed, and tokens kept.
    */
  def surgical(corpus: DataFrame, probes: DataFrame, idCol: String,
               textCol: String, n: Int = 8): DataFrame =
    surgicalAgainst(corpus, probeSet(probes, textCol, n), idCol, textCol, n)

  /** As [[surgical]], against a pre-computed [[probeSet]]. */
  def surgicalAgainst(corpus: DataFrame, probeShingles: DataFrame,
                      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    // both sides index the SAME token sequence (empties filtered), so
    // a window hit at offset p always covers kept-side tokens p..p+n-1
    def toksOf = filter(wsTokens(col(textCol)), t => length(t) > 0)
    val hits = corpus.select(col(idCol).as("__doc"),
        posexplode(GraftFunctions.shinglePosFast(toksOf, n)))
      .toDF("__doc", "__pos", "__sh")
      .join(broadcast(probeShingles.select(col("sh").as("__sh"))), Seq("__sh"),
        "left_semi")
      .groupBy(col("__doc"))
      .agg(collect_list(col("__pos")).as("__starts"))
    val toks = toksOf
    val starts = coalesce(col("__starts"), array().cast("array<int>"))
    val kept = filter(toks, (t, i) =>
      !exists(starts, p => i >= p && i < p + n))
    corpus
      .join(broadcast(hits), col(idCol) === col("__doc"), "left")
      .select(col(idCol),
        concat_ws(" ", kept).as("clean_text"),
        (size(toks) - size(kept)).cast("bigint").as("n_tokens_removed"),
        size(kept).cast("bigint").as("n_tokens_kept"))
  }
}

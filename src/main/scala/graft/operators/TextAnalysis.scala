package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Text-corpus analysis operators for large-scale training-data
  * pipelines (SURVEY.md §2c rows 41-44). All per-row column math —
  * no shuffle, fully codegen'd; at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Language marker lexicons for the n-gram/stopword heuristic.
    * Deterministic scoring: hits per language, argmax with a fixed
    * preference order on ties.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  private def hitCount(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(lit): _*)))
      .cast("bigint")

  /** Sentence segmentation: split on terminal-punctuation runs
    * followed by whitespace (`[.!?]+\s+` — deliberately inside the
    * RE2-compatible subset, no lookbehind, so external engines
    * reproduce the exact same boundaries), blanks dropped, sentences
    * renumbered from 0. Entirely scan-local: split → trim → filter →
    * posexplode inside the projection, no token crosses an exchange —
    * the segmentation front end of chunking/packing pipelines.
    */
  def sentences(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(filter(transform(split(col(textCol), "[.!?]+\\s+"),
          s => trim(s)), s => length(s) > 0)))
      .select(col(idCol), col("pos").cast("bigint").as("sentence_no"),
        col("col").as("sentence"),
        length(col("col")).cast("bigint").as("n_chars"))

  /** doc_id + token statistics: chars, whitespace tokens, distinct
    * types, BPE-ish lexer tokens.
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = wsTokens(col(textCol))
    df.select(
      col(idCol),
      length(col(textCol)).cast("bigint").as("n_chars"),
      size(toks).cast("bigint").as("n_tokens"),
      size(array_distinct(toks)).cast("bigint").as("n_types"),
      size(bpeTokens(col(textCol))).cast("bigint").as("n_bpe_tokens"))
  }

  /** Quality scoring: stopword ratio, mean token length, digit and
    * punctuation counts, and a boolean keep/drop verdict.
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = wsTokens(col(textCol))
    val nTokens = size(toks).cast("bigint")
    val nStop = hitCount(toks, stopwords)
    val charSum = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("bigint"))
    df.select(
      col(idCol),
      nTokens.as("n_tokens"),
      nStop.as("n_stopwords"),
      (nStop.cast("double") / nTokens.cast("double")).as("stopword_ratio"),
      (charSum.cast("double") / nTokens.cast("double")).as("mean_token_len"),
      size(regexp_extract_all(col(textCol), lit("[0-9]"), lit(0))).cast("bigint").as("n_digits"),
      size(regexp_extract_all(col(textCol), lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("bigint").as("n_punct"))
      .withColumn("quality_ok",
        col("n_tokens") >= 5 && col("stopword_ratio") < lit(0.5) && col("mean_token_len") < lit(15.0))
  }

  /** Gopher-style heuristic quality RULE BANK (the published web-corpus
    * document filters of Rae et al. 2021 / MassiveText, distinct from
    * [[quality]]'s raw signal ratios): each document is evaluated
    * against an ordered list of named rules — word-count bounds, mean
    * and max word length, alphabetic-word fraction, distinct-stopword
    * presence — and the verdict carries ATTRIBUTION: `kept` plus the
    * FIRST failed rule's name, so a pipeline can report exactly which
    * filter removed how much of the corpus (the per-rule attrition
    * table every data-curation writeup publishes).
    *
    * Engine-portable by construction: counts are integers, the
    * alphabetic fraction is compared by integer cross-multiplication
    * (`den·alpha ≥ num·words`, no float boundary), and mean word
    * length is one exactly-rounded IEEE division — every rule decides
    * identically in any engine. All per-row column math: no shuffle,
    * no UDF; at 100 TB this runs at scan speed.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxWordLen: Int = 20,
                  alphaFracNum: Int = 4, alphaFracDen: Int = 5,
                  minStopwords: Int = 2,
                  stopList: Seq[String] = Seq("the", "a", "of", "to", "and"))
      : DataFrame = {
    val toks = wsTokens(col(textCol))
    val lens = transform(toks, t => length(t).cast("bigint"))
    val stats = df.select(
      col(idCol),
      size(toks).cast("bigint").as("n_words"),
      (aggregate(lens, lit(0L), (a, x) => a + x).cast("double") /
        size(toks).cast("double")).as("mean_word_len"),
      array_max(lens).cast("bigint").as("max_word_len"),
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("bigint")
        .as("alpha_words"),
      // the published Gopher/MassiveText heuristic counts stopword
      // HITS regardless of case or attached punctuation ("The",
      // "the," both count) — match on the lowered token with trailing
      // punctuation stripped, not the raw token
      size(array_distinct(filter(
        transform(toks, t => regexp_replace(lower(t), "[\\p{Punct}]+$", "")),
        t => t.isin(stopList.map(lit): _*))))
        .cast("bigint").as("n_stop_distinct"))
    // ordered rules: first failure is the attributed one
    val rules: Seq[(String, Column)] = Seq(
      "word_count" ->
        (col("n_words") >= minWords && col("n_words") <= maxWords),
      "mean_word_len" ->
        (col("mean_word_len") >= minMeanLen &&
          col("mean_word_len") <= maxMeanLen),
      "max_word_len" -> (col("max_word_len") <= maxWordLen),
      "alpha_ratio" ->
        (col("alpha_words") * lit(alphaFracDen.toLong) >=
          col("n_words") * lit(alphaFracNum.toLong)),
      "stopwords" -> (col("n_stop_distinct") >= minStopwords))
    val firstFailed = rules.foldRight(lit(null).cast("string")) {
      case ((name, ok), rest) => when(!ok, lit(name)).otherwise(rest)
    }
    stats
      .withColumn("kept", rules.map(_._2).reduce(_ && _))
      .withColumn("first_failed_rule", firstFailed)
  }

  /** Language identification by marker-word scoring. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = wsTokens(lower(col(textCol)))
    val scored = df.select(
      col(idCol) +:
        langMarkers.map { case (lang, words) => hitCount(toks, words).as(s"${lang}_hits") }: _*)
    // argmax with fixed preference order (earlier language wins ties):
    // lang i is chosen when its hits are >0 and >= every later lang's
    // (earlier langs already failed their own stricter check).
    val langs = langMarkers.map(_._1)
    val best = langs.zipWithIndex.foldRight(lit("und")) { case ((lang, i), rest) =>
      val geLater = langs.drop(i + 1)
        .foldLeft(col(s"${lang}_hits") > 0)((acc, later) =>
          acc && col(s"${lang}_hits") >= col(s"${later}_hits"))
      when(geLater, lit(lang)).otherwise(rest)
    }
    scored.withColumn("pred_lang", best)
  }

  /** Order-sensitive document fingerprint (polynomial rolling hash)
    * plus a shingle-set fingerprint (min of shingle hashes).
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = wsTokens(col(textCol))
    df.select(
      col(idCol),
      rollingHash(toks).as("rolling_fp"),
      aggregate(wordShingles(toks, 3), lit(Long.MaxValue),
        (acc, s) => least(acc, xxhash64(s))).as("shingle_fp"))
  }

  /** Top-k most distinctive terms per document by TF-IDF with a
    * LINEAR smoothed inverse document frequency,
    * `score = tf * (N + 1) / (df + 1)` — the linear idf keeps the
    * score a pure +,*,/ double computation, bit-reproducible across
    * engines (log's last-ulp varies by libm, which would break exact
    * oracle comparison; the RANKING a log idf induces is identical
    * because log is monotone).
    *
    * Scale shape: tokens explode map-side; term frequencies aggregate
    * with map-side partials on (doc, term); document frequencies are
    * one more partial agg on term (counting (doc, term) rows, already
    * distinct); the corpus size joins in as a broadcast scalar; and
    * the per-doc top-k goes through the heap-based TopKPerKey exec —
    * no window sort over the full posting list.
    */
  def tfIdfTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    import org.apache.spark.sql.graft.TopKPerKey
    val toks = df.select(col(idCol),
      explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("bigint").as("df"))
    val n = df.agg(count(lit(1)).cast("double").as("n"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          ((col("n") + lit(1.0)) / (col("df").cast("double") + lit(1.0))))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"))
    TopKPerKey(scored, Seq(idCol),
      Seq("score" -> true, "term" -> false), k)
  }

  /** BM25 retrieval scoring: rank documents against a (small) probe
    * query set — the retrieval side of data curation (mining documents
    * relevant to a benchmark/topic, hard-negative selection). Okapi
    * BM25 with a RATIONAL idf `(N − df + 0.5)/(df + 0.5)` (the
    * log-free variant: ranks identically to the `ln(1 + …)` form
    * because ln is monotone, but stays pure +,*,/ double math —
    * bit-reproducible against an external oracle, the same trade
    * [[tfIdfTopK]] makes).
    *
    * Scale shape: the probe set is model-sized and BROADCAST, so the
    * corpus-side posting table is pruned to probe terms before any
    * shuffle (df counts ride the pruned table — identical values,
    * none of the full-vocabulary aggregation); per-query top-k goes
    * through the TopKPerKey heap exec, never a window sort.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, String)], k: Int = 5,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.graft.TopKPerKey
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol),
      explode(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("term"))
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    val dl = toks.groupBy(col(idCol))
      .agg(count(lit(1)).cast("bigint").as("dl"))
    // scalars: corpus size and average doc length (exact integer sums
    // divided once — engine-portable)
    val stats = df.agg(count(lit(1)).cast("double").as("n")).crossJoin(
      toks.agg(count(lit(1)).cast("double").as("sumdl")))
      .withColumn("avgdl", col("sumdl") / col("n"))
    val qterms = queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(regexp_extract_all(lower(col("qtext")), lit("[a-z0-9]+"), lit(0)))
          .as("term"))
      .dropDuplicates("query_id", "term") // query terms are a SET
    // prune the posting table to probe terms BEFORE computing df:
    // df per probe term is identical, and the full-vocabulary
    // aggregation never happens
    val tfq = tf.join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val dfreq = tfq.groupBy("term")
      .agg(count(lit(1)).cast("bigint").as("df"))
    // constants combine as COLUMN arithmetic (k1 + 1.0, 1.0 − b …) so
    // both engines fold the same IEEE operations in the same order
    val k1C = lit(k1)
    val bC = lit(b)
    val contrib = tfq
      .join(broadcast(qterms), Seq("term"))
      .join(dfreq, Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("c",
        ((col("n") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))) *
          (col("tf").cast("double") * (k1C + lit(1.0))) /
          (col("tf").cast("double") +
            k1C * (lit(1.0) - bC + bC * col("dl").cast("double") / col("avgdl"))))
    val scored = contrib.groupBy(col("query_id"), col(idCol))
      .agg(round(sum(col("c")), 6).as("bm25"))
    TopKPerKey(scored, Seq("query_id"),
      Seq("bm25" -> true, idCol -> false), k, rankCol = Some("rank"))
  }

  /** Repetition signals for quality filtering (the duplicate-n-gram
    * fractions of the published web-corpus filtering recipes): a
    * document whose n-grams repeat heavily is boilerplate or spam.
    * Distinct counts come from the codegen'd shingle-hash expression,
    * so this too runs at scan speed.
    */
  /** Compression-ratio quality signal (the deflate filter of the
    * published web-corpus pipelines: highly compressible text is
    * boilerplate/template/spam; near-incompressible text is noise or
    * binary junk). Pure JDK `Deflater` — one instance REUSED across a
    * partition via `mapPartitions` (allocation-free steady state),
    * raw-deflate at default level for determinism across JVMs.
    * Per-row narrow work: no shuffle, cost is the deflate pass over
    * the scan.
    */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit](_ => deflater.end())
        val buf = new Array[Byte](64 * 1024)
        val out = rows.map { case (id, text) =>
          val bytes = (if (text == null) "" else text).getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          val ratio =
            if (bytes.length == 0) 1.0
            else compressed.toDouble / bytes.length.toDouble
          (id, bytes.length.toLong, compressed, ratio)
        }
        out
      }
      .toDF("doc_id", "n_bytes", "deflate_bytes", "compression_ratio")
  }

  /** URL canonicalization — the normalization under web-corpus URL
    * dedup and per-domain aggregation: the same page arrives as
    * `HTTPS://Site.com/p?utm_source=x&b=2&a=1#frag` and
    * `https://site.com/p?a=1&b=2`; naive string equality treats them
    * as different documents. Canonical form: scheme and host
    * lowercased (path case PRESERVED — it is significant per RFC
    * 3986), fragment dropped, `utm_*` tracking parameters dropped,
    * remaining parameters sorted. Pure `functions._` composition —
    * stays in the scan's codegen span, and every step has an exact
    * cross-engine equivalent (the oracle recomputes it all in SQL).
    * Expects scheme-qualified URLs (`…://…`).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    val qstr = when(instr(noFrag, "?") > 0, substring_index(noFrag, "?", -1))
      .otherwise(lit(""))
    val params = sort_array(filter(split(qstr, "&"),
      p => !p.startsWith("utm_") && p =!= ""))
    val scheme = substring_index(base, "://", 1)
    val rest = substring_index(base, "://", -1)
    val host = substring_index(rest, "/", 1)
    val path = rest.substr(length(host) + 1, length(rest))
    concat(lower(scheme), lit("://"), lower(host), path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val toks = wsTokens(col(textCol))
    val nTok = size(toks).cast("bigint")
    def dupFrac(n: Int): Column = {
      val total = nTok - (n - 1)
      val distinctN = size(graft.plans.GraftFunctions.shingleFast(toks, n)).cast("bigint")
      when(total > 0, lit(1.0) - distinctN.cast("double") / total.cast("double"))
        .otherwise(0.0)
    }
    df.select(col(idCol), nTok.as("n_tokens"),
      dupFrac(2).as("dup_2gram_frac"), dupFrac(3).as("dup_3gram_frac"))
  }

  /** EXACT multi-phrase containment search — the dictionary-tagging /
    * filter-list primitive (blocklist hits, boilerplate markers,
    * contamination probes): which documents contain each phrase as a
    * CONTIGUOUS whitespace-token run.
    *
    * Shape at 100 TB: the dictionary is model-sized (`maxPhrases`
    * knob, the q54 convention) and never shuffled. Per distinct
    * phrase length L, each doc's shingle-hash array (the codegen
    * ShingleHash64 — no n-gram string ever allocated) is intersected
    * IN THE SCAN with the L-token phrase hashes (a literal array —
    * the hash chain is replicated driver-side, same XXH64 seed), so
    * non-matching docs die in their scan task: no explode, no
    * shuffle of text, candidate volume = true-hit volume plus 64-bit
    * collisions. Candidates explode their matched hashes (few per
    * doc), equi-join the broadcast dictionary on (L, hash), and an
    * exact substring check on the whitespace-normalized text FILTERS
    * collision false-positives — every surviving row is a true
    * containment, no probabilistic residue.
    *
    * @return one row per phrase (absent phrases included):
    *         (phrase, n_docs)
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
                   phrases: Seq[String], maxPhrases: Int = 10000): DataFrame = {
    require(phrases.nonEmpty, "phraseSearch: empty phrase list")
    require(phrases.size <= maxPhrases,
      s"phraseSearch: ${phrases.size} phrases exceed maxPhrases=$maxPhrases " +
        "— the dictionary must stay model-sized (raise the knob only " +
        "with broadcast headroom)")
    val spark = df.sparkSession
    graft.plans.GraftFunctions.register(spark)
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    def chainHash(toks: Seq[String]): Long = {
      var h = 42L
      toks.foreach { t =>
        h = XXH64.hashLong(XXH64.hashUTF8String(UTF8String.fromString(t), 42L), h)
      }
      h
    }
    val parsed = phrases.distinct.map { p =>
      val toks = p.trim.split("\\s+").toSeq
      require(toks.nonEmpty && toks.head.nonEmpty,
        s"phraseSearch: blank phrase '$p'")
      (p.trim.split("\\s+").mkString(" "), toks.length, chainHash(toks))
    }
    require(parsed.map(_._1).distinct.size == parsed.size,
      "phraseSearch: phrases collapse to duplicates after whitespace " +
        "normalization")
    import spark.implicits._
    val dict = broadcast(spark.createDataset(parsed)
      .toDF("phrase", "len", "h"))
    val norm = concat(lit(" "),
      regexp_replace(trim(col(textCol)), "\\s+", " "), lit(" "))
    val byLen = parsed.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (len, ps) =>
        val wanted = array(ps.map(p => lit(p._3)): _*)
        df.select(col(idCol).as("__doc"), norm.as("__norm"),
            lit(len).as("len"),
            array_intersect(
              graft.plans.GraftFunctions.shingleFast(wsTokens(col(textCol)), len),
              wanted).as("__hits"))
          .filter(size(col("__hits")) > 0)
          .select(col("__doc"), col("__norm"), col("len"),
            explode(col("__hits")).as("h"))
    }
    val candidates = byLen.reduce(_ unionByName _)
    val verified = candidates.join(dict, Seq("len", "h"))
      .filter(col("__norm").contains(concat(lit(" "), col("phrase"), lit(" "))))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"))
    dict.select(col("phrase")).join(verified, Seq("phrase"), "left")
      .select(col("phrase"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
  }
}

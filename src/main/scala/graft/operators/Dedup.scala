package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.plans.GraftFunctions

/** Corpus deduplication operators (SURVEY.md §2c rows 34-38).
  *
  * Scale shapes:
  *  - exact: one hash-aggregate on the normalized text (map-side
  *    partial agg first, so duplicate-heavy corpora shrink before the
  *    shuffle);
  *  - ngramJaccard: inverted-index self-join — only (shingle, doc)
  *    pairs shuffle, never documents; shingles occurring once are
  *    dropped before the join; hot shingles are capped to bound skew;
  *  - minhashLsh: per-row signatures (zero shuffle), then a bucket
  *    join that shuffles only (band, bucket-hash) keys;
  *  - simhash: per-row 64-bit sketch; candidate pairs via chunk
  *    pigeonhole (hamming <= 3 pairs must share one of 4 16-bit
  *    chunks), verified with bit_count.
  *  - embeddingNearDup: hyperplane-LSH buckets, exact cosine verify
  *    inside buckets only.
  */
object Dedup {

  /** Spread rows across cores when the source has fewer partitions
    * than the cluster (a single parquet file reads as ONE task, which
    * serializes the expensive per-row sketching). No-op when the
    * input is already parallel — large inputs keep their layout.
    */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // probe via toRdd: QueryExecution caches it lazily, so the same
    // RDD backs the eventual action — unlike df.rdd, which builds a
    // fresh deserializer RDD per call just to read the partition count
    val parts = df.queryExecution.toRdd.getNumPartitions
    if (parts < math.max(2, target / 2)) df.repartition(target) else df
  }

  /** Canonical whitespace/case normalization for exact dedup. */
  private def normText(c: org.apache.spark.sql.Column) =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** One row per distinct normalized text: representative id (min),
    * copy count, and an md5 of the normalized text.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), normText(col(textCol)).as("__norm"))
      .groupBy(col("__norm"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).cast("bigint").as("n_copies"))
      .select(md5(col("__norm")).as("text_md5"), col("rep_id"), col("n_copies"))

  /** Per-group duplication rollup (dataset-governance view of exact
    * dedup): how much of each source/slice is copies. One hash
    * aggregation — distinct normalized texts counted per group, the
    * duplicated fraction reported as an exact integer ppm
    * (floor((n_docs − n_distinct)·10⁶ / n_docs) in bigint algebra,
    * so the number is bit-stable across engines and partitionings).
    */
  def dupStats(df: DataFrame, idCol: String, textCol: String,
               groupCol: String): DataFrame =
    df.select(col(groupCol), normText(col(textCol)).as("__norm"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        countDistinct(col("__norm")).cast("bigint").as("n_distinct"))
      .select(col(groupCol),
        col("n_docs"),
        col("n_distinct"),
        (col("n_docs") - col("n_distinct")).as("n_dup_docs"),
        // `div` = exact bigint floor division (plain `/` is DOUBLE in
        // Spark SQL and its rounding could flip the last digit)
        expr("(n_docs - n_distinct) * 1000000 div n_docs").as("dup_ppm"))

  /** Near-duplicate pairs by exact word-n-gram Jaccard similarity.
    *
    * @param maxShinglePosting drop shingles shared by more than this
    *        many docs before pairing (stopword-shingle skew guard;
    *        a shingle in k docs generates k^2 candidate pairs).
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.8,
                   maxShinglePosting: Int = 1000): DataFrame =
    sharedWindowCounts(df, idCol, textCol, n, maxShinglePosting)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))

  /** Doc pairs sharing at least `minShared` distinct `windowTokens`-token
    * windows — SUBSTRING-level overlap, the copied-span signal
    * (boilerplate reuse, quotation, benchmark contamination between
    * documents that are NOT whole-document near-duplicates; the
    * repeated-substring regime of Lee et al. 2022, arXiv:2107.06499).
    * Long windows make a shared window strong evidence of copying
    * where 3-gram Jaccard sees only diffuse similarity. Same scale
    * discipline as [[ngramJaccard]]: 8-byte window hashes only,
    * postings capped, co-partitioned pair join.
    */
  def overlapSpans(df: DataFrame, idCol: String, textCol: String,
                   windowTokens: Int = 10, minShared: Long = 1,
                   maxWindowPosting: Int = 1000): DataFrame =
    sharedWindowCounts(df, idCol, textCol, windowTokens, maxWindowPosting)
      .filter(col("n_common") >= minShared)
      .select(col("doc_a"), col("doc_b"),
        col("n_common").as("n_shared_windows"))

  /** Cross-SOURCE contamination matrix: for every (source, source)
    * pair, how many document pairs share at least one
    * `windowTokens`-token window, and how many distinct windows they
    * share in total — the dataset-governance rollup of
    * [[overlapSpans]] (which web dump leaked into which curated set;
    * how much boilerplate two crawls share). Symmetric: sources are
    * ordered within each pair, and same-source overlap is reported on
    * the diagonal. Scale shape is the pair core's; the rollup itself
    * is one aggregation over the (already bounded) pair table.
    */
  def sourceOverlapMatrix(df: DataFrame, idCol: String, textCol: String,
                          sourceCol: String, windowTokens: Int = 8,
                          maxWindowPosting: Int = 1000): DataFrame = {
    val pairs = sharedWindowCounts(df, idCol, textCol, windowTokens,
      maxWindowPosting)
    val src = df.select(col(idCol), col(sourceCol))
    pairs
      .join(src.select(col(idCol).as("doc_a"), col(sourceCol).as("__sa")), "doc_a")
      .join(src.select(col(idCol).as("doc_b"), col(sourceCol).as("__sb")), "doc_b")
      .select(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"),
        col("n_common"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).cast("bigint").as("n_doc_pairs"),
        sum(col("n_common")).cast("bigint").as("n_shared_windows"))
  }

  /** Shared pair-counting core: (doc_a, doc_b, n_a, n_b, n_common)
    * where n_common = distinct n-token windows the pair shares.
    *
    * Shuffles 8-byte window hashes, never window strings (a word
    * n-gram averages ~20 bytes and the posting shuffle dominates).
    * Window identities come from the codegen'd graft_shingles
    * expression — one fused hash loop per row, no intermediate
    * n-gram strings. The doc's window count RIDES ALONG each posting
    * row (+8 bytes) so a similarity denominator needs no second
    * shingling pass. The inverted index keeps only windows that can
    * produce a pair and are under the skew cap; pairing is a
    * co-partitioned self-join WITHIN each window (both sides reuse
    * one exchange), pairs streaming out of the sort-merge join into
    * the map-side partial count — no per-window array materialized,
    * join-side buffering bounded by the cap.
    */
  private def sharedWindowCounts(df: DataFrame, idCol: String,
                                 textCol: String, n: Int,
                                 maxPosting: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    // materialize the shingle arrays ONCE: this frame feeds three plan
    // branches (the posting-count aggregate and both sides of the
    // candidate self-join), and only the self-join's two sides
    // canonicalize to a reusable exchange — without pinning, the
    // per-token hashing (the dominant CPU here) re-runs per branch.
    // Footprint is one hash array per doc ≈ the corpus itself, the
    // same size every shuffle in this pipeline already carries.
    val shingled = spread(df).select(col(idCol).as("doc"),
      GraftFunctions.shingleFast(wsTokens(col(textCol)), n).as("sh_hashes"))
      .localCheckpoint(true)
    val posting = shingled
      .select(col("doc"), size(col("sh_hashes")).as("n_sh"),
        explode(col("sh_hashes")).as("sh"))
    val postingCnt = posting.groupBy("sh")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").between(2, maxPosting))
      .select("sh")
    val kept = posting.join(postingCnt, Seq("sh"))
    kept
      .select(col("sh"), col("doc").as("doc_a"), col("n_sh").as("n_a"))
      .join(kept.select(col("sh"), col("doc").as("doc_b"), col("n_sh").as("n_b")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "n_a", "n_b") // n_* functionally determined by doc_*
      .agg(count(lit(1)).cast("bigint").as("n_common"))
  }

  /** Candidate near-duplicate pairs via MinHash + LSH banding,
    * verified by exact Jaccard on the candidates only.
    *
    * @param numHashes signature length; bands of `rowsPerBand` hashes
    *        each — a pair collides in a band iff that band of the
    *        signature matches exactly.
    * @param maxBucketSize drop band buckets holding more than this
    *        many docs before pairing (the analog of ngramJaccard's
    *        maxShinglePosting: a degenerate corpus where thousands of
    *        docs share a signature band would otherwise turn one
    *        bucket quadratic; such groups are exact-dedup's job).
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 4,
                 threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must be divisible by rowsPerBand")
    val numBands = numHashes / rowsPerBand
    GraftFunctions.register(df.sparkSession)
    // fully hash-based: codegen'd shingle identities feed the codegen
    // signature (MinHashSig consumes the pre-hashed array<long>
    // directly) — no n-gram string ever exists, in any stage
    val shingled = spread(df).select(col(idCol).as("doc"),
      GraftFunctions.shingleFast(wsTokens(col(textCol)), n).as("sh_hashes"))
      .withColumn("sig", GraftFunctions.minhashFast(col("sh_hashes"), numHashes))
    // (band, hash-of-band-slice) bucket keys carry ONLY the doc id —
    // shuffling the shingle arrays numBands times would dominate the
    // job; candidates re-fetch their shingles by id afterwards
    // ONE explicit exchange on the bucket key: the bucket-size count,
    // and BOTH sides of the capped self-join, are co-partitioned
    // against it (ReuseExchange collapses them to a single shuffle of
    // (doc, band, bh) rows), so the scan+shingle+signature subtree
    // runs once for the whole banding stage instead of once per
    // consumer — same shape as ngramJaccard's posting join.
    val banded = shingled.select(col("doc"),
      explode(transform(sequence(lit(0), lit(numBands - 1)), b =>
        struct(b.as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)), b).as("bh"))))
        .as("bucket"))
      .select(col("doc"), col("bucket.band"), col("bucket.bh"))
      .repartition(col("band"), col("bh"))
    // skew cap: only buckets that can produce a pair and are under the
    // cap enter the self-join (the co-partitioned join then buffers at
    // most maxBucketSize rows per key)
    val bucketCnt = banded.groupBy("band", "bh")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").between(2, maxBucketSize))
      .select("band", "bh")
    val kept = banded.join(bucketCnt, Seq("band", "bh"))
    val a = kept.select(col("band"), col("bh"), col("doc").as("doc_a"))
    val b = kept.select(col("band"), col("bh"), col("doc").as("doc_b"))
    val candidates = a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
    // exact-Jaccard verification on candidates only (hashed shingle
    // sets joined back by id — candidate count << corpus size; the
    // intersect runs on sorted 8-byte arrays, not strings)
    val shOnly = shingled.select(col("doc"), col("sh_hashes"))
    candidates
      .join(shOnly.select(col("doc").as("doc_a"), col("sh_hashes").as("sh_a")), "doc_a")
      .join(shOnly.select(col("doc").as("doc_b"), col("sh_hashes").as("sh_b")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("bigint"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
  }

  /** Materialize the deduplicated corpus: drop every document that
    * belongs to a near-duplicate component but is not its
    * representative (minimum id). Composes pair generation +
    * connected components + one anti-join — the end-to-end "dedup
    * the corpus" operation a training pipeline actually runs.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val pairs = ngramJaccard(df, idCol, textCol, n, threshold)
    val comp = Components.connectedComponents(pairs, "doc_a", "doc_b")
    val losers = comp.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Materialize the deduplicated corpus keeping the BEST member of
    * each near-duplicate component by a caller-chosen score (r17) —
    * the production representative policy: min-id
    * ([[dropNearDuplicates]]) is arbitrary, while a training
    * pipeline wants the longest / highest-quality member of every
    * duplicate cluster to survive. Ties break to the smallest id
    * (total order ⇒ deterministic under any partitioning).
    *
    * Same scale shape as dropNearDuplicates: pair generation +
    * pointer-jumping components + ONE component-cardinality
    * aggregate (max_by over a (score, −id) struct) + one anti-join —
    * the representative choice adds a broadcast-sized join against
    * the component membership, never a corpus shuffle.
    */
  def dropNearDuplicatesKeepBest(df: DataFrame, idCol: String,
                                 textCol: String, scoreCol: String,
                                 n: Int = 3,
                                 threshold: Double = 0.8): DataFrame = {
    val pairs = ngramJaccard(df, idCol, textCol, n, threshold)
    val comp = Components.connectedComponents(pairs, "doc_a", "doc_b")
    val scored = comp.join(
      df.select(col(idCol).as("id"), col(scoreCol).as("__score")),
      Seq("id"))
    val reps = scored.groupBy(col("component"))
      .agg(max_by(col("id"),
        struct(col("__score"), (col("id") * -1).as("negid"))).as("rep"))
    val losers = scored.join(reps, Seq("component"))
      .filter(col("id") =!= col("rep"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Near-duplicate pairs by SimHash hamming distance.
    *
    * Pigeonhole banding: a pair with hamming <= maxHamming (< number
    * of 16-bit chunks) must agree exactly on at least one chunk, so
    * only chunk-equal pairs are compared.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "4-chunk pigeonhole guarantees hamming <= 3")
    GraftFunctions.register(df.sparkSession)
    val sketched = spread(df).select(col(idCol).as("doc"),
      GraftFunctions.simhashFast(wsTokens(col(textCol))).as("sk"))
    val chunked = sketched.select(col("doc"), col("sk"),
      explode(transform(sequence(lit(0), lit(3)), c =>
        struct(c.as("chunk"),
          call_function("shiftright", col("sk"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ck")))).as("b"))
      .select(col("doc"), col("sk"), col("b.chunk"), col("b.ck"))
    val a = chunked.select(col("chunk"), col("ck"), col("doc").as("doc_a"), col("sk").as("sk_a"))
    val b = chunked.select(col("chunk"), col("ck"), col("doc").as("doc_b"), col("sk").as("sk_b"))
    a.join(b, Seq("chunk", "ck"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", hamming64(col("sk_a"), col("sk_b")).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** SemDeDup-style semantic deduplication (cluster-then-dedup; the
    * published pipeline k-means clusters the embedding space and
    * compares pairs WITHIN clusters only — arXiv:2303.09540). Reuses
    * the IVF trainer ([[IvfIndex.train]]) for centroids and the
    * codegen cosine for verification; pair generation is a
    * co-partitioned self-join on the cluster id, so work is
    * sum-of-squares over cluster sizes, never corpus-quadratic. At
    * scale, `numClusters` grows with the corpus to keep clusters
    * modest (the paper's regime); as a hard guard, clusters larger
    * than `maxClusterSize` opt out of pair generation entirely — the
    * same skip-the-degenerate-bucket convention the LSH operators
    * use batch- and state-side.
    *
    * Keeps the smallest id of each duplicate pair chain; returns the
    * surviving corpus. Approximate by design: a true pair split
    * across clusters is missed (recall), but every drop is verified
    * by exact cosine (precision is exact — spec-pinned).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    threshold: Double = 0.95, numClusters: Int = 0,
                    maxClusterSize: Int = 10000): DataFrame =
    semanticDedupWithReport(df, idCol, vecCol, threshold, numClusters,
      maxClusterSize)._1

  /** [[semanticDedup]] plus its cap-opt-out report: `(survivors,
    * report)` where the report is ONE row — (clusters_skipped,
    * docs_skipped, corpus_fraction) — quantifying the over-cap
    * clusters that kept all members. Skipping the degenerate bucket
    * is the right scale behavior, but it must never be silent (a
    * corpus whose embeddings collapse to one cluster would otherwise
    * report "deduped" while comparing nothing). The report is lazy:
    * it costs one aggregate over the cluster-size table (k rows)
    * when the caller materializes it.
    */
  def semanticDedupWithReport(df: DataFrame, idCol: String, vecCol: String,
                              threshold: Double = 0.95, numClusters: Int = 0,
                              maxClusterSize: Int = 10000): (DataFrame, DataFrame) = {
    val k = if (numClusters > 0) numClusters
            else autoClusterCount(df.count(), maxClusterSize)
    val model = IvfIndex.train(df, idCol, vecCol, k)
    semanticDedupWithModel(df, idCol, vecCol, model, threshold, maxClusterSize)
  }

  /** The auto-k policy (the paper's regime: clusters stay modest as
    * data grows): k = n / (maxClusterSize/4), clamped to [4, 4096].
    * Quadratic work per cluster is then bounded by (maxClusterSize/4)^2
    * regardless of corpus size. Shared by the fresh-train form and any
    * caller training a model for [[semanticDedupIndexed]] — the
    * persisted-model path must exercise the same k policy production
    * would, not a fixture constant.
    */
  def autoClusterCount(n: Long, maxClusterSize: Int = 10000): Int =
    math.min(4096L, math.max(4L, n / math.max(1, maxClusterSize / 4))).toInt

  /** [[semanticDedup]] against a PRE-TRAINED (typically persisted)
    * k-means model — the production path: training pays a full corpus
    * pass plus centroid iterations, so a scheduled dedup over a
    * slowly-drifting corpus should reuse a saved model
    * ([[IvfIndex.save]]/[[IvfIndex.load]], with
    * [[IvfIndex.refresh]]'s drift guard advising retrains) instead of
    * re-clustering per run — the `ann_ivf_indexed` pattern applied to
    * dedup. Same output as the fresh-train form given the same model
    * (parity spec-pinned).
    */
  def semanticDedupIndexed(df: DataFrame, idCol: String, vecCol: String,
                           modelDir: String, threshold: Double = 0.95,
                           maxClusterSize: Int = 10000): DataFrame = {
    val model = IvfIndex.load(df.sparkSession, modelDir)
    semanticDedupWithModel(df, idCol, vecCol, model, threshold,
      maxClusterSize)._1
  }

  private def semanticDedupWithModel(
      df: DataFrame, idCol: String, vecCol: String, model: IvfIndex.Model,
      threshold: Double, maxClusterSize: Int): (DataFrame, DataFrame) = {
    GraftFunctions.register(df.sparkSession)
    val assigned = IvfIndex.assign(spread(df), idCol, vecCol, model)
    val sizes = assigned.groupBy(col("c")).agg(count(lit(1)).as("__n"))
    val smallClusters = sizes.filter(col("__n") <= maxClusterSize)
      .select(col("c"))
    val report = sizes.agg(
      coalesce(sum(when(col("__n") > maxClusterSize, 1L)), lit(0L))
        .as("clusters_skipped"),
      coalesce(sum(when(col("__n") > maxClusterSize, col("__n"))), lit(0L))
        .as("docs_skipped"),
      sum(col("__n")).as("__total"))
      .select(col("clusters_skipped"), col("docs_skipped"),
        round(col("docs_skipped") / col("__total"), 6).as("corpus_fraction"))
    val ok = assigned.join(broadcast(smallClusters), Seq("c"))
    val a = ok.select(col("c"), col("base_id").as("id_a"),
      col("base_v").as("v_a"))
    val b = ok.select(col("c"), col("base_id").as("id_b"),
      col("base_v").as("v_b"))
    val drops = a.join(b, Seq("c"))
      .filter(col("id_a") < col("id_b"))
      .filter(GraftFunctions.cosineFast(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    (df.join(drops, Seq(idCol), "left_anti"), report)
  }

  /** Near-duplicate embedding pairs: hyperplane-LSH bucket join +
    * exact cosine verification within buckets.
    *
    * @param maxBucketSize drop hyperplane buckets holding more than
    *        this many vectors before pairing — the same skew cap every
    *        other candidate-pair path here applies (minhashLsh's
    *        maxBucketSize, ngramJaccard's maxShinglePosting). With only
    *        2^numPlanes buckets, a low-variance or adversarial
    *        embedding set collapses into few buckets and the
    *        within-bucket self-join goes quadratic in corpus size;
    *        over-cap buckets opt out here and are quantified by
    *        [[embeddingNearDupWithReport]].
    */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double = 0.95, numPlanes: Int = 8,
                       maxBucketSize: Int = 1000): DataFrame =
    embeddingNearDupWithReport(df, idCol, vecCol, threshold, numPlanes,
      maxBucketSize)._1

  /** Hyperplane-count policy: enough planes that a uniformly-spread
    * corpus's expected bucket size sits ~4x under the cap, so the cap
    * only fires on genuinely skewed (low-variance/adversarial) regions
    * rather than on sheer corpus growth. Clamped to [4, 24]: fewer
    * than 4 planes gives no locality, more than 24 (16M buckets) only
    * shreds recall.
    */
  def autoPlanes(n: Long, maxBucketSize: Int = 1000): Int = {
    val target = math.max(1.0, maxBucketSize / 4.0)
    val p = math.ceil(math.log(math.max(1.0, n / target)) / math.log(2.0)).toInt
    math.min(24, math.max(4, p))
  }

  /** [[embeddingNearDup]] plus a ONE-row report — (buckets_skipped,
    * vecs_skipped, corpus_fraction) — quantifying what the bucket cap
    * excluded, mirroring semanticDedup's report convention: a capped
    * path that doesn't say how much it skipped looks complete when it
    * isn't.
    */
  def embeddingNearDupWithReport(df: DataFrame, idCol: String, vecCol: String,
                                 threshold: Double = 0.95, numPlanes: Int = 8,
                                 maxBucketSize: Int = 1000)
      : (DataFrame, DataFrame) = {
    GraftFunctions.register(df.sparkSession)
    val bucketed = spread(df).select(col(idCol).as("vid"), col(vecCol).as("v"),
      hyperplaneBucket(col(vecCol), numPlanes).as("bucket"))
      .repartition(col("bucket"))
    // bucket sizes from the same exchange the self-join consumes
    // (ReuseExchange collapses them); only pair-capable, under-cap
    // buckets enter the join, so it buffers at most maxBucketSize rows
    // per key no matter how the corpus distributes over 2^numPlanes
    // buckets.
    val sizes = bucketed.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val okBuckets = sizes.filter(col("cnt").between(2, maxBucketSize))
      .select("bucket")
    val report = sizes.agg(
      coalesce(sum(when(col("cnt") > maxBucketSize, 1L)), lit(0L))
        .as("buckets_skipped"),
      coalesce(sum(when(col("cnt") > maxBucketSize, col("cnt"))), lit(0L))
        .as("vecs_skipped"),
      sum(col("cnt")).as("__total"))
      .select(col("buckets_skipped"), col("vecs_skipped"),
        round(col("vecs_skipped") / col("__total"), 6).as("corpus_fraction"))
    val kept = bucketed.join(okBuckets, Seq("bucket"))
    val a = kept.select(col("bucket"), col("vid").as("id_a"), col("v").as("v_a"))
    val b = kept.select(col("bucket"), col("vid").as("id_b"), col("v").as("v_b"))
    val pairs = a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", GraftFunctions.cosineFast(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
    (pairs, report)
  }
}

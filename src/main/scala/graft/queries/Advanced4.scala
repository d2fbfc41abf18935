package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableCatalog._

/** Round-12 (third wave): RAKE keyword extraction and exact nDCG@10
  * ranking evaluation. SURVEY.md §2 rows 151-152.
  *
  * Both use the q114 literal-constant discipline for engine
  * portability: every irrational (1/log2 discounts) or ratio (RAKE's
  * degree/frequency) is either a PRECOMPUTED decimal literal shared
  * verbatim with the oracle or a floor-scaled exact integer — sums
  * are then order-free integer/decimal algebra, and at most ONE
  * double division reaches the surface.
  */
object Advanced4 {

  type Q = (SparkSession, String) => DataFrame

  // ---- text_rake: RAKE keyword extraction (Rose et al. 2010) —
  //      candidate phrases are maximal stopword-free token runs;
  //      word score = degree/frequency over the corpus-wide phrase
  //      co-occurrence, floor-scaled to an exact integer
  //      (deg·10^6 DIV freq) so phrase scores are order-free integer
  //      sums; top-3 phrases per doc with (score desc, phrase)
  //      tie-break. The stopword list is the fixed q44 lexicon,
  //      spelled identically in the oracle. ----
  private val rakeStops: Seq[String] =
    Seq("the", "a", "of", "and", "is", "to", "in", "that", "it",
      "for", "on", "with", "as", "at", "by", "an", "be", "this",
      "are", "was", "or", "from", "has", "had", "were")

  val textRake: Q = (s, d) => {
    val toks = documents(s, d)
      .select(col("doc_id"),
        posexplode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val stopCol = col("tok").isin(rakeStops: _*)
    val phrased = toks
      .withColumn("phrase_id",
        sum(when(stopCol, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(!stopCol)
      .localCheckpoint(true) // word stats + phrase assembly below
    val phraseLen = phrased.groupBy(col("doc_id"), col("phrase_id"))
      .agg(count(lit(1)).as("plen"))
    val withLen = phrased.join(phraseLen, Seq("doc_id", "phrase_id"))
    val wordStats = withLen.groupBy(col("tok"))
      .agg(count(lit(1)).cast("bigint").as("freq"),
        sum(col("plen")).cast("bigint").as("deg"))
      .withColumn("wscore", expr("deg * 1000000 DIV freq"))
    val phraseScore = withLen
      .join(wordStats.select(col("tok"), col("wscore")), Seq("tok"))
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(sum(col("wscore")).cast("bigint").as("score"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("phrase"))
    val top = phraseScore
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("phrase"), col("phrase_id"))))
      .filter(col("rk") <= 3)
    top.select(col("doc_id"), col("rk").cast("bigint").as("rk"),
      col("phrase"), col("score"))
  }

  val textRakeOracle: String = {
    val stops = rakeStops.map(sw => s"'$sw'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
       |    CAST(unnest(range(len(regexp_extract_all(lower(text), '[a-z0-9]+')))) AS BIGINT) AS pos
       |  FROM documents),
       |ph AS (
       |  SELECT doc_id, tok, pos,
       |    SUM(CASE WHEN tok IN ($stops) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
       |  FROM toks),
       |phrased AS (SELECT * FROM ph WHERE tok NOT IN ($stops)),
       |plen AS (
       |  SELECT doc_id, phrase_id, COUNT(*) AS plen
       |  FROM phrased GROUP BY 1, 2),
       |wl AS (
       |  SELECT p.*, l.plen FROM phrased p
       |  JOIN plen l ON l.doc_id = p.doc_id AND l.phrase_id = p.phrase_id),
       |ws AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq,
       |    CAST(SUM(plen) AS BIGINT) AS deg
       |  FROM wl GROUP BY 1),
       |wsc AS (SELECT tok, deg * 1000000 // freq AS wscore FROM ws),
       |psc AS (
       |  SELECT wl.doc_id, wl.phrase_id,
       |    CAST(SUM(w.wscore) AS BIGINT) AS score,
       |    STRING_AGG(wl.tok, ' ' ORDER BY wl.pos) AS phrase
       |  FROM wl JOIN wsc w ON w.tok = wl.tok
       |  GROUP BY 1, 2),
       |rk AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, phrase, phrase_id) AS rk
       |  FROM psc)
       |SELECT doc_id, CAST(rk AS BIGINT) AS rk, phrase, score
       |FROM rk WHERE rk <= 3""".stripMargin
  }

  // ---- q124: exact nDCG@10 — the graded-ranking evaluation next to
  //      q105's ROC AUC and q113's average precision. Ranking: docs
  //      by (n_chars desc, doc_id) within each source; binary
  //      relevance lang='en'. The 1/log2(i+1) discounts are
  //      PRECOMPUTED 12-decimal literals (and their prefix sums, for
  //      the ideal DCG) shared verbatim with the oracle — DCG/IDCG
  //      are exact DECIMAL sums of literals, nDCG the ONE double
  //      division, rounded to 9. Sources with no relevant doc are
  //      excluded (0/0). ----
  private val ndcgK = 10
  private val discounts: IndexedSeq[java.math.BigDecimal] =
    (1 to ndcgK).map { i =>
      new java.math.BigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
        .setScale(12, java.math.RoundingMode.HALF_UP)
    }
  private val discountPrefix: IndexedSeq[java.math.BigDecimal] =
    discounts.scanLeft(java.math.BigDecimal.ZERO)(_ add _).tail

  val q124Ndcg: Q = (s, d) => {
    val ranked = documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"),
        when(col("lang") === "en", 1L).otherwise(0L).as("rel"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
    val dCase = (1 to ndcgK).foldLeft(when(lit(false), lit(null))) {
      (acc, i) => acc.when(col("rk") === i, lit(discounts(i - 1)))
    }
    val dcg = ranked.filter(col("rk") <= ndcgK)
      .groupBy(col("source"))
      .agg(sum(when(col("rel") === 1, dCase).otherwise(lit(java.math.BigDecimal.ZERO)))
        .as("dcg"))
    val relTotal = ranked.groupBy(col("source"))
      .agg(sum(col("rel")).cast("bigint").as("n_rel"))
    val idcgCase = (1 to ndcgK).foldLeft(when(lit(false), lit(null))) {
      (acc, j) => acc.when(least(col("n_rel"), lit(ndcgK.toLong)) === j,
        lit(discountPrefix(j - 1)))
    }
    dcg.join(relTotal, Seq("source"))
      .filter(col("n_rel") > 0)
      .select(col("source"), col("n_rel"),
        round(col("dcg").cast("double") / idcgCase.cast("double"), 9)
          .as("ndcg"))
  }

  val q124Oracle: String = {
    val dCase = (1 to ndcgK)
      .map(i => s"WHEN rk = $i THEN CAST('${discounts(i - 1)}' AS DECIMAL(20,12))")
      .mkString(" ")
    val pCase = (1 to ndcgK)
      .map(j => s"WHEN LEAST(n_rel, $ndcgK) = $j THEN CAST('${discountPrefix(j - 1)}' AS DECIMAL(20,12))")
      .mkString(" ")
    s"""WITH ranked AS (
       |  SELECT source, doc_id, n_chars,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id) AS rk
       |  FROM documents),
       |dcg AS (
       |  SELECT source,
       |    SUM(CASE WHEN rel = 1 THEN (CASE $dCase END)
       |        ELSE CAST(0 AS DECIMAL(20,12)) END) AS dcg
       |  FROM ranked WHERE rk <= $ndcgK GROUP BY 1),
       |rt AS (
       |  SELECT source, CAST(SUM(rel) AS BIGINT) AS n_rel
       |  FROM ranked GROUP BY 1)
       |SELECT d.source, r.n_rel,
       |  ROUND(CAST(d.dcg AS DOUBLE) /
       |        CAST((CASE $pCase END) AS DOUBLE), 9) AS ndcg
       |FROM dcg d JOIN rt r ON r.source = d.source
       |WHERE r.n_rel > 0""".stripMargin
  }

  // ---- q125: winsorized mean — the outlier-robust mean by ORDER-
  //      STATISTIC clipping (bottom/top 10% of rows clipped to the
  //      (k+1)-th / (n−k)-th smallest value, k = n·10 DIV 100): the
  //      thresholds are exact integer cents (no interpolated
  //      percentile — an interpolated threshold is a double whose
  //      last ulp could flip a clip), the clipped sum rides the
  //      per-VALUE count table (value-cardinality, the q93
  //      discipline), and the mean is the ONE double division,
  //      rounded to 6. ----
  val q125Winsorized: Q = (s, d) => {
    val vals = lineitem(s, d).select(col("l_returnflag").as("f"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long").as("v"))
    val perValue = vals.groupBy(col("f"), col("v"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
    val w = Window.partitionBy(col("f")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = perValue.withColumn("cum", sum(col("cnt")).over(w))
      .localCheckpoint(true) // thresholds + clipped sum below
    val n = cum.groupBy(col("f"))
      .agg(max(col("cum")).cast("bigint").as("n"))
      .withColumn("k", expr("n * 10 DIV 100"))
    val lo = cum.join(n, Seq("f"))
      .filter(col("cum") >= col("k") + 1)
      .groupBy(col("f")).agg(min(col("v")).as("lo"))
    val hi = cum.join(n, Seq("f"))
      .filter(col("cum") >= col("n") - col("k"))
      .groupBy(col("f")).agg(min(col("v")).as("hi"))
    cum.join(lo, Seq("f")).join(hi, Seq("f")).join(n, Seq("f"))
      .withColumn("cv", greatest(col("lo"), least(col("hi"), col("v"))))
      .groupBy(col("f"), col("n"), col("k"), col("lo"), col("hi"))
      .agg(sum(col("cv").cast("decimal(38,0)") * col("cnt")).as("csum"))
      .select(col("f"), col("n"), col("k"), col("lo"), col("hi"),
        round(col("csum").cast("double") / col("n").cast("double") / lit(100), 6)
          .as("winsorized_mean"))
  }

  val q125Oracle: String =
    """WITH vals AS (
      |  SELECT l_returnflag AS f,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      |  FROM lineitem),
      |pv AS (SELECT f, v, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM vals GROUP BY 1, 2),
      |cu AS (SELECT *, SUM(cnt) OVER (PARTITION BY f ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM pv),
      |nn AS (SELECT f, CAST(MAX(cum) AS BIGINT) AS n,
      |    CAST(MAX(cum) AS BIGINT) * 10 // 100 AS k
      |  FROM cu GROUP BY 1),
      |lo AS (SELECT cu.f, MIN(v) AS lo FROM cu JOIN nn ON nn.f = cu.f
      |  WHERE cum >= k + 1 GROUP BY 1),
      |hi AS (SELECT cu.f, MIN(v) AS hi FROM cu JOIN nn ON nn.f = cu.f
      |  WHERE cum >= n - k GROUP BY 1)
      |SELECT cu.f, nn.n, nn.k, lo.lo, hi.hi,
      |  ROUND(CAST(SUM(GREATEST(lo.lo, LEAST(hi.hi, cu.v)) * cu.cnt) AS DOUBLE)
      |    / CAST(nn.n AS DOUBLE) / 100, 6) AS winsorized_mean
      |FROM cu JOIN nn ON nn.f = cu.f JOIN lo ON lo.f = cu.f
      |  JOIN hi ON hi.f = cu.f
      |GROUP BY cu.f, nn.n, nn.k, lo.lo, hi.hi""".stripMargin

  // ---- q126: feature hashing (the hashing trick, Weinberger et al.
  //      '09) — fixed-width bag-of-words via the engine-portable md5
  //      bucket (the cvFolds idiom), the tokenizer-free featurizer
  //      under linear classifiers at corpus scale. Sparse output
  //      (doc, bucket, count), exact integers; one (doc, bucket)
  //      hash aggregate with map-side combine. ----
  val q126FeatureHash: Q = (s, d) => {
    val toks = documents(s, d)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("tok"))
    toks.withColumn("bucket",
        pmod(conv(substring(md5(col("tok").cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(256L)))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
  }

  val q126Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 256 AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM toks GROUP BY 1, 2""".stripMargin

  // ---- q127: per-nation quantile normalization of account balances
  //      onto the pooled distribution (Bolstad '03 — the multi-source
  //      batch-effect remover): every nation's balances are remapped
  //      to the pooled order statistics at the same within-nation
  //      relative ranks, making sources comparable without trusting
  //      either's calibration. Exact rank algebra (ceil(r·N/n_g) in
  //      DECIMAL(38,0) floor form), order statistics never
  //      interpolated; two distributed rank passes + one equi-join ----
  val q127QuantileNorm: Q = (s, d) =>
    graft.operators.FeatureEncoding.quantileNormalize(
      customer(s, d).select(col("c_custkey"), col("c_nationkey").as("nation"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents")),
      "nation", "bal_cents", "c_custkey")

  val q127Oracle: String =
    """WITH v AS (
      |  SELECT c_custkey AS id, c_nationkey AS nation,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      |  FROM customer),
      |n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nn FROM v),
      |g AS (SELECT id, nation, cents,
      |        ROW_NUMBER() OVER (PARTITION BY nation ORDER BY cents, id) AS r,
      |        COUNT(*) OVER (PARTITION BY nation) AS ng
      |      FROM v),
      |o AS (SELECT cents AS qnorm, ROW_NUMBER() OVER (ORDER BY cents, id) AS k
      |      FROM v),
      |t AS (SELECT g.*, CAST((CAST(r AS HUGEINT) * nn + ng - 1) // ng AS BIGINT) AS tk
      |      FROM g CROSS JOIN n)
      |SELECT t.id AS c_custkey, t.nation, t.cents AS bal_cents, o.qnorm
      |FROM t JOIN o ON o.k = t.tk""".stripMargin

  // ---- text_phrase_search: exact multi-phrase containment over the
  //      corpus (blocklist/boilerplate/contamination-probe tagging).
  //      Dictionary mixes 2- and 3-token phrases plus one absent
  //      phrase (must report 0). Scan-side shingle-hash intersect
  //      prunes to true hits + collisions, exact substring verify
  //      removes the collisions — every count is exact ----
  private val searchPhrases = Seq(
    "table scan", "hash join", "sort merge",
    "key agg row", "fast merge batch",
    "zebra quantum xylophone")

  val textPhraseSearch: Q = (s, d) =>
    graft.operators.TextAnalysis.phraseSearch(
      documents(s, d), "doc_id", "text", searchPhrases)

  val textPhraseSearchOracle: String =
    """WITH p(phrase) AS (VALUES ('table scan'), ('hash join'),
      |                          ('sort merge'), ('key agg row'),
      |                          ('fast merge batch'),
      |                          ('zebra quantum xylophone')),
      |d AS (SELECT ' ' || regexp_replace(trim(text), '\s+', ' ', 'g') || ' '
      |             AS norm
      |      FROM documents)
      |SELECT p.phrase,
      |       CAST(COALESCE(SUM(CASE WHEN contains(d.norm,
      |         ' ' || p.phrase || ' ') THEN 1 ELSE 0 END), 0) AS BIGINT)
      |         AS n_docs
      |FROM p CROSS JOIN d
      |GROUP BY p.phrase""".stripMargin

  // ---- q128: deterministic negative sampling — per customer the
  //      first 5 portable pseudo-random parts they did NOT buy (the
  //      contrastive-pair / link-prediction negative side). Every
  //      draw replays from md5, so the oracle re-derives the whole
  //      sample; true purchases removed by one anti-join ----
  val q128NegativeSample: Q = (s, d) => {
    val edges = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
        col("l_partkey")), "o_orderkey")
      .select(col("o_custkey"), col("l_partkey"))
    val nParts = part(s, d).count()
    graft.operators.Sampling.negativeSample(
      customer(s, d), "c_custkey", edges, "o_custkey", "l_partkey",
      numItems = nParts, k = 5, oversample = 4)
  }

  val q128Oracle: String =
    """WITH np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM part),
      |u AS (SELECT DISTINCT c_custkey AS u FROM customer),
      |cand AS (
      |  SELECT u.u, i.i,
      |    (CAST(('0x' || substr(md5(CAST(u.u AS VARCHAR) || ':neg:' ||
      |       CAST(i.i AS VARCHAR)), 1, 8)) AS BIGINT) % np.n) + 1 AS item
      |  FROM u CROSS JOIN np CROSS JOIN generate_series(1, 20) AS i(i)),
      |e AS (SELECT DISTINCT o_custkey AS u, l_partkey AS item
      |      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |surv AS (
      |  SELECT c.u, c.item, MIN(c.i) AS i
      |  FROM cand c ANTI JOIN e ON c.u = e.u AND c.item = e.item
      |  GROUP BY c.u, c.item),
      |r AS (SELECT u, item, i,
      |        ROW_NUMBER() OVER (PARTITION BY u ORDER BY i, item) AS rn
      |      FROM surv)
      |SELECT u AS c_custkey, CAST(rn AS BIGINT) AS neg_rank,
      |       item AS negative_item
      |FROM r WHERE rn <= 5""".stripMargin

  // ---- q129: golden-record survivorship — per customer, each FIELD
  //      independently keeps its latest non-null value across the
  //      order history (whole-row latest-wins loses older rows'
  //      still-current fields under PARTIAL updates). Partial updates
  //      are simulated by deterministic md5 field masks the oracle
  //      replays; recency = o_orderkey (unique, the CDC seqno
  //      convention) ----
  val q129GoldenRecord: Q = (s, d) => {
    def pres(f: String, pct: Int) =
      graft.operators.Sampling.portableBucket(
        concat(col("o_orderkey").cast("string"), lit(":" + f)), 100L) < pct
    val updates = orders(s, d).select(col("o_custkey"), col("o_orderkey"),
      when(pres("st", 60), col("o_orderstatus")).as("status"),
      when(pres("pr", 40), col("o_orderpriority")).as("priority"),
      when(pres("tp", 25),
        round(col("o_totalprice") * 100).cast("long")).as("price_cents"))
    graft.cdc.Survivorship.goldenRecord(updates, "o_custkey",
      Seq("o_orderkey"), Seq("status", "priority", "price_cents"))
  }

  val q129Oracle: String =
    """WITH u AS (
      |  SELECT o_custkey, o_orderkey,
      |    CASE WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
      |      || ':st'), 1, 8)) AS BIGINT) % 100 < 60
      |      THEN o_orderstatus END AS status,
      |    CASE WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
      |      || ':pr'), 1, 8)) AS BIGINT) % 100 < 40
      |      THEN o_orderpriority END AS priority,
      |    CASE WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
      |      || ':tp'), 1, 8)) AS BIGINT) % 100 < 25
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT) END AS price_cents
      |  FROM orders)
      |SELECT o_custkey,
      |  arg_max(status, o_orderkey) FILTER (WHERE status IS NOT NULL)
      |    AS status,
      |  arg_max(priority, o_orderkey) FILTER (WHERE priority IS NOT NULL)
      |    AS priority,
      |  arg_max(price_cents, o_orderkey)
      |    FILTER (WHERE price_cents IS NOT NULL) AS price_cents,
      |  CAST(COUNT(*) AS BIGINT) AS n_updates,
      |  MAX(o_orderkey) AS last_seen
      |FROM u GROUP BY o_custkey""".stripMargin

  // ---- q130: reciprocal-rank fusion — combine two heterogeneous
  //      document rankings (length-based and hash-scattered, standing
  //      in for BM25-vs-ANN) with the zero-tuning RRF combiner.
  //      Both rankings come from the DISTRIBUTED Ranking.globalRank
  //      (range partitions + driver offsets), reciprocals are
  //      floor-scaled exact integers (10¹² div (60+rank)), the fused
  //      score an order-free bigint sum; top-20 deterministic ----
  val q130Rrf: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"), col("n_chars"),
      graft.operators.Sampling.portableBucket(
        concat(col("doc_id").cast("string"), lit(":rrf")), 1000000000L)
        .as("__h"))
      .localCheckpoint(true)
    val byLen = graft.operators.Ranking.globalRank(
      docs.withColumn("__neg", -col("n_chars")),
      Seq("__neg", "doc_id"), "rank", 0)
    val byHash = graft.operators.Ranking.globalRank(
      docs, Seq("__h", "doc_id"), "rank", 0)
    val fused = graft.operators.Ranking.rrfFuse(
      Seq(byLen, byHash), "doc_id", "rank")
    org.apache.spark.sql.graft.TopKPerKey(
      fused.withColumn("__g", lit(1)), Seq("__g"),
      Seq("rrf_score" -> true, "doc_id" -> false), 20,
      rankCol = Some("fused_rank"))
      .select(col("doc_id"), col("fused_rank"), col("rrf_score"))
  }

  val q130Oracle: String =
    """WITH h AS (
      |  SELECT doc_id, n_chars,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':rrf'), 1, 8))
      |      AS BIGINT) % 1000000000 AS hh
      |  FROM documents),
      |a AS (SELECT doc_id,
      |        ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r FROM h),
      |b AS (SELECT doc_id,
      |        ROW_NUMBER() OVER (ORDER BY hh, doc_id) AS r FROM h),
      |u AS (SELECT doc_id, 1000000000000 // (60 + r) AS rr FROM a
      |      UNION ALL
      |      SELECT doc_id, 1000000000000 // (60 + r) AS rr FROM b),
      |f AS (SELECT doc_id, CAST(SUM(rr) AS BIGINT) AS rrf_score
      |      FROM u GROUP BY doc_id)
      |SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT)
      |    AS fused_rank,
      |  rrf_score
      |FROM f ORDER BY fused_rank LIMIT 20""".stripMargin

  // ---- text_coverage_select (rows-only — iterative greedy argmax
  //      has no SQL oracle form, the ann_mmr convention; spec-pinned
  //      to a driver greedy reference): pick the 10 documents that
  //      together cover the most vocabulary — the submodular
  //      set-cover curation baseline ----
  val textCoverageSelect: Q = (s, d) =>
    graft.operators.Sampling.coverageGreedy(
      documents(s, d), "doc_id", "text", k = 10)

  // ---- q132: grid hotspot scan over the q110 hash-scattered integer
  //      points — per occupied cell its count and 3×3-neighborhood
  //      count, top-10 hotspots by (neighbor_n desc, cx, cy). Exact
  //      integers end to end; the neighbor sum explodes the CELL
  //      table (model-sized), never the points ----
  val q132Hotspot: Q = (s, d) => {
    val pts = customer(s, d).select(
      expr("(c_custkey * 2654435761L) % 100000").as("x"),
      expr("(c_custkey * 40503L + 12345) % 100000").as("y"))
    val cells = graft.operators.SpatialJoin.gridHotspots(pts, "x", "y",
      cellSize = 5000L)
    org.apache.spark.sql.graft.TopKPerKey(
      cells.withColumn("__g", lit(1)), Seq("__g"),
      Seq("neighbor_n" -> true, "cx" -> false, "cy" -> false), 10,
      rankCol = Some("hot_rank"))
      .select(col("hot_rank"), col("cx"), col("cy"), col("n"),
        col("neighbor_n"))
  }

  val q132Oracle: String =
    """WITH p AS (SELECT (c_custkey * 2654435761) % 100000 AS x,
      |                  (c_custkey * 40503 + 12345) % 100000 AS y
      |           FROM customer),
      |cells AS (SELECT x // 5000 AS cx, y // 5000 AS cy,
      |            CAST(COUNT(*) AS BIGINT) AS n
      |          FROM p GROUP BY 1, 2),
      |contrib AS (
      |  SELECT cells.cx + d.dx AS cx, cells.cy + d.dy AS cy,
      |         CAST(SUM(n) AS BIGINT) AS neighbor_n
      |  FROM cells CROSS JOIN (
      |    SELECT dx.r AS dx, dy.r AS dy
      |    FROM range(-1, 2) dx(r) CROSS JOIN range(-1, 2) dy(r)) d
      |  GROUP BY 1, 2),
      |j AS (SELECT c.cx, c.cy, c.n, t.neighbor_n
      |      FROM cells c JOIN contrib t ON t.cx = c.cx AND t.cy = c.cy)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY neighbor_n DESC, cx, cy)
      |         AS BIGINT) AS hot_rank,
      |       cx, cy, n, neighbor_n
      |FROM j ORDER BY hot_rank LIMIT 10""".stripMargin

  // ---- q133: seasonal-naive forecast backtest — the monitoring
  //      baseline every forecasting system is graded against:
  //      predict(day) = actual(day − 7), absolute percentage error
  //      per day in exact fixed-point ppm (|a−p|·10⁶ DIV a — floor
  //      division, a > 0 by construction), per-year MAPE the ONE
  //      double division rounded 9. The 7-day lag is an EQUI-join of
  //      the day-cardinality daily table against itself shifted —
  //      never a window over the raw orders ----
  val q133Backtest: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .cast("bigint").as("a"))
    val pred = daily.select(date_add(col("day"), 7).as("day"),
      col("a").as("p"))
    daily.join(pred, Seq("day"))
      .withColumn("ape_ppm", expr("abs(a - p) * 1000000 DIV a"))
      .groupBy(year(col("day")).as("yr"))
      .agg(count(lit(1)).cast("bigint").as("n_days"),
        sum(col("ape_ppm")).cast("bigint").as("sum_ape_ppm"))
      .withColumn("mape_ppm",
        round(col("sum_ape_ppm").cast("double") /
          col("n_days").cast("double"), 9))
  }

  val q133Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS a
      |  FROM orders GROUP BY 1),
      |j AS (
      |  SELECT d.day, d.a, p.a AS p
      |  FROM daily d JOIN daily p ON p.day + INTERVAL 7 DAY = d.day),
      |s AS (SELECT year(day) AS yr, abs(a - p) * 1000000 // a AS ape_ppm
      |      FROM j)
      |SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(SUM(ape_ppm) AS BIGINT) AS sum_ape_ppm,
      |  ROUND(CAST(SUM(ape_ppm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
      |    AS mape_ppm
      |FROM s GROUP BY yr""".stripMargin

  // ---- q134: join-key skew advisor — the pre-shuffle profile for
  //      three star-schema join keys (a hot FK, a dimension FK, and
  //      the near-unique PK side): exact key cardinality, hottest-key
  //      ppm share, mean and p99 multiplicity; everything after the
  //      per-key count runs at count-of-counts cardinality, the p99
  //      off a distributed PrefixSum ----
  val q134SkewReport: Q = (s, d) => {
    val li = lineitem(s, d)
    val o = orders(s, d)
    Seq(
      ("lineitem.l_orderkey",
        graft.operators.TableStats.joinSkewReport(li, "l_orderkey")),
      ("lineitem.l_partkey",
        graft.operators.TableStats.joinSkewReport(li, "l_partkey")),
      ("orders.o_custkey",
        graft.operators.TableStats.joinSkewReport(o, "o_custkey")))
      .map { case (name, r) => r.withColumn("join_key", lit(name)) }
      .reduce(_ unionByName _)
      .select(col("join_key"), col("n_rows"), col("n_keys"),
        col("max_cnt"), col("max_share_ppm"), col("avg_cnt"),
        col("p99_cnt"))
  }

  val q134Oracle: String = {
    def one(name: String, table: String, key: String) =
      s"""SELECT '$name' AS join_key, n_rows, n_keys, max_cnt,
         |  CAST(max_cnt * 1000000 // n_rows AS BIGINT) AS max_share_ppm,
         |  CAST(n_rows // n_keys AS BIGINT) AS avg_cnt,
         |  (SELECT MIN(cnt) FROM (
         |     SELECT cnt, SUM(n_keys_at) OVER (ORDER BY cnt) AS cum
         |     FROM (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS n_keys_at
         |           FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cnt
         |                 FROM $table GROUP BY $key) GROUP BY cnt)) c
         |   CROSS JOIN (SELECT CAST(COUNT(DISTINCT $key) AS BIGINT) nk
         |               FROM $table) t
         |   WHERE c.cum * 100 >= t.nk * 99) AS p99_cnt
         |FROM (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
         |        CAST(COUNT(*) AS BIGINT) AS n_keys,
         |        CAST(MAX(c) AS BIGINT) AS max_cnt
         |      FROM (SELECT COUNT(*) AS c FROM $table GROUP BY $key))"""
        .stripMargin
    Seq(one("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      one("lineitem.l_partkey", "lineitem", "l_partkey"),
      one("orders.o_custkey", "orders", "o_custkey"))
      .mkString("\nUNION ALL\n")
  }

  // ---- q135: IPF raking weights (Deming–Stephan) — rebalance the
  //      corpus to UNIFORM language AND source marginals at once; 3
  //      fixed-point integer iterations the oracle unrolls verbatim ----
  val q135Rake: Q = (s, d) =>
    graft.operators.Sampling.rakeWeights(
      documents(s, d).where(col("lang").isNotNull && col("source").isNotNull),
      "lang", "source", iters = 3)

  val q135Oracle: String = {
    val iter = (i: Int) =>
      s"""w${i}r AS (
         |  SELECT w${i - 1}.lang, w${i - 1}.source, w${i - 1}.n,
         |    (w${i - 1}.w * t.tr) // rm.m AS w
         |  FROM w${i - 1}
         |  JOIN (SELECT lang, SUM(n * w) AS m FROM w${i - 1} GROUP BY 1) rm
         |    ON rm.lang = w${i - 1}.lang
         |  CROSS JOIN t),
         |w$i AS (
         |  SELECT w${i}r.lang, w${i}r.source, w${i}r.n,
         |    (w${i}r.w * t.tc) // cm.m AS w
         |  FROM w${i}r
         |  JOIN (SELECT source, SUM(n * w) AS m FROM w${i}r GROUP BY 1) cm
         |    ON cm.source = w${i}r.source
         |  CROSS JOIN t)""".stripMargin
    s"""WITH cells AS (
       |  SELECT lang, source, CAST(COUNT(*) AS HUGEINT) AS n
       |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
       |  GROUP BY 1, 2),
       |t AS (SELECT
       |    (SUM(n) * 1000000) // COUNT(DISTINCT lang) AS tr,
       |    (SUM(n) * 1000000) // COUNT(DISTINCT source) AS tc
       |  FROM cells),
       |w0 AS (SELECT lang, source, n, CAST(1000000 AS HUGEINT) AS w
       |       FROM cells),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)}
       |SELECT lang, source, CAST(n AS BIGINT) AS n,
       |  CAST(w AS BIGINT) AS weight_ppm
       |FROM w3""".stripMargin
  }

  // ---- text_token_budget: per-source TOKEN-budget mixture cut —
  //      each source contributes its longest docs first until 1000
  //      tokens per source (the doc-count cap of text_source_cap can't weigh a
  //      stub against an article). Distributed per-group prefix sum:
  //      composite globalRank + PrefixSum, prior-group masses off a
  //      second group-cardinality PrefixSum — no partitioned window
  //      (one giant source would sit in one window task) ----
  val textTokenBudget: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"), col("source"),
      size(graft.functions.wsTokens(col("text"))).cast("bigint").as("n_tok"),
      (-col("n_chars")).cast("long").as("__negq"))
    graft.operators.Sampling.tokenBudgetPerGroup(docs, "source", "n_tok",
        Seq("__negq", "doc_id"), budget = 1000L)
      .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tokens"))
  }

  val textTokenBudgetOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
      |      AS n_tok,
      |    n_chars
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, n_tok,
      |    CAST(SUM(n_tok) OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_tokens
      |  FROM d)
      |SELECT doc_id, source, n_tok, cum_tokens
      |FROM c WHERE cum_tokens <= 1000""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_token_budget" -> textTokenBudget,
    "q135_rake" -> q135Rake,
    "q134_skew_report" -> q134SkewReport,
    "q133_backtest" -> q133Backtest,
    "q132_hotspot" -> q132Hotspot,
    "text_coverage_select" -> textCoverageSelect,
    "q130_rrf" -> q130Rrf,
    "q129_golden_record" -> q129GoldenRecord,
    "q128_negative_sample" -> q128NegativeSample,
    "text_phrase_search" -> textPhraseSearch,
    "text_rake" -> textRake,
    "q124_ndcg" -> q124Ndcg,
    "q125_winsorized" -> q125Winsorized,
    "q126_feature_hash" -> q126FeatureHash,
    "q127_quantile_norm" -> q127QuantileNorm)

  val oracles: Map[String, String] = Map(
    "text_token_budget" -> textTokenBudgetOracle,
    "q135_rake" -> q135Oracle,
    "q134_skew_report" -> q134Oracle,
    "q133_backtest" -> q133Oracle,
    "q132_hotspot" -> q132Oracle,
    "q130_rrf" -> q130Oracle,
    "q129_golden_record" -> q129Oracle,
    "q128_negative_sample" -> q128Oracle,
    "text_phrase_search" -> textPhraseSearchOracle,
    "text_rake" -> textRakeOracle,
    "q124_ndcg" -> q124Oracle,
    "q125_winsorized" -> q125Oracle,
    "q126_feature_hash" -> q126Oracle,
    "q127_quantile_norm" -> q127Oracle)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Bfs, FeatureEncoding, PrefixSum, Ranking, Sampling, SetSimJoin, Skyline}
import graft.plans.GraftFunctions
import graft.sources.TableCatalog._

/** Round-11 additions: skyline, graph BFS, attribution, feature
  * preparation, Jaro-Winkler matching, sweep-line concurrency, epoch
  * upsampling, PMI collocations, vocabulary coverage. SURVEY.md §2
  * rows 66-75.
  *
  * Same oracle-parity discipline as [[Relational]]: exact integer /
  * DECIMAL statistics everywhere, doubles only in a final fixed IEEE
  * formula shared verbatim with the DuckDB oracle, deterministic
  * tie-breaks on every top-k.
  */
object Advanced {

  type Q = (SparkSession, String) => DataFrame

  // ---- q73: Pareto frontier (skyline) of the part catalog —
  //      cheapest price vs largest size. Local-skyline-per-shard
  //      prunes in parallel; the global pass sees only survivors
  //      (see operators.Skyline for the plan shape). The oracle is
  //      the independent quadratic NOT EXISTS derivation. ----
  val q73Skyline: Q = (s, d) => {
    val p = part(s, d).select(col("p_partkey"),
      round(col("p_retailprice") * 100).cast("long").as("price_cents"),
      col("p_size").cast("long").as("size"))
    Skyline.pareto2d(p, "price_cents", "size", col("p_partkey"))
  }

  val q73Oracle: String =
    """WITH p AS (SELECT p_partkey,
      |  CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
      |  CAST(p_size AS BIGINT) AS size FROM part)
      |SELECT a.p_partkey, a.price_cents, a.size FROM p a
      |WHERE NOT EXISTS (SELECT 1 FROM p b
      |  WHERE b.price_cents <= a.price_cents AND b.size >= a.size
      |    AND (b.price_cents < a.price_cents OR b.size > a.size))""".stripMargin

  // ---- q74: multi-source BFS over the (undirected) customer
  //      parent-walk graph — min hop distance from seed custkeys
  //      {1,2,3}, grouped by distance ring. Oracle: recursive CTE
  //      with set-dedup, then MIN per node. ----
  val q74Bfs: Q = (s, d) => {
    val c = customer(s, d).select(col("c_custkey").as("k"))
      .filter(col("k") > 0)
    val down = c.filter(expr("k div 10") > 0)
      .select(expr("k div 10").as("src"), col("k").as("dst"))
    val sym = down.unionByName(
      down.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = s.range(1, 4).toDF("node")
    Bfs.multiSourceBfs(sym, "src", "dst", seeds, "node", maxHops = 5)
      .groupBy(col("dist"))
      .agg(count(lit(1)).cast("bigint").as("n_nodes"),
        sum(col("node")).cast("bigint").as("sum_node"))
  }

  val q74Oracle: String =
    """WITH RECURSIVE
      |c AS (SELECT c_custkey AS k FROM customer WHERE c_custkey > 0),
      |down AS (SELECT k // 10 AS src, k AS dst FROM c WHERE k // 10 > 0),
      |sym AS (SELECT src, dst FROM down UNION SELECT dst, src FROM down),
      |walk(node, dist) AS (
      |  SELECT CAST(v.node AS BIGINT), CAST(0 AS BIGINT)
      |  FROM (VALUES (1),(2),(3)) v(node)
      |  UNION
      |  SELECT e.dst, w.dist + 1 FROM walk w
      |  JOIN sym e ON w.node = e.src WHERE w.dist < 5),
      |best AS (SELECT node, MIN(dist) AS dist FROM walk GROUP BY node)
      |SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  CAST(SUM(node) AS BIGINT) AS sum_node
      |FROM best GROUP BY dist""".stripMargin

  // ---- q75: marketing attribution — each purchase credited to the
  //      user's FIRST and LAST prior touch (click/view), per-user
  //      ordered window with a deterministic event_id tie-break.
  //      Per-user window state only: scales with the largest user
  //      history, not the table. ----
  val q75Attribution: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type").isin("click", "view"), col("event_type"))
    events(s, d)
      .withColumn("ft", first(touch, ignoreNulls = true).over(w))
      .withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("ft"), lit("none")).as("first_touch"),
        coalesce(col("lt"), lit("none")).as("last_touch"))
      .agg(count(lit(1)).cast("bigint").as("n_purchases"),
        count_distinct(col("user_id")).cast("bigint").as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  val q75Oracle: String =
    """WITH t AS (
      |  SELECT user_id, event_type, value,
      |    first_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft,
      |    last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
      |  FROM events)
      |SELECT COALESCE(ft, 'none') AS first_touch,
      |  COALESCE(lt, 'none') AS last_touch,
      |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM t WHERE event_type = 'purchase' GROUP BY 1, 2""".stripMargin

  // ---- q76: per-source feature scaling of document lengths —
  //      min-max + z-score from one exact-stat aggregation pass
  //      (operators.FeatureEncoding; the q20 decimal discipline). ----
  val q76FeatureScale: Q = (s, d) =>
    FeatureEncoding.scaleNumeric(
      documents(s, d).select(col("doc_id"), col("source"), col("n_chars")),
      "source", "n_chars")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("minmax"), col("zscore"))

  val q76Oracle: String =
    """WITH st AS (
      |  SELECT source, MIN(n_chars) AS mn, MAX(n_chars) AS mx,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(CAST(n_chars AS DECIMAL(18,2)) * CAST(n_chars AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx
      |  FROM documents GROUP BY source)
      |SELECT d.doc_id, d.source, d.n_chars,
      |  CASE WHEN st.mx = st.mn THEN 0.0
      |       ELSE CAST(d.n_chars - st.mn AS DOUBLE) / CAST(st.mx - st.mn AS DOUBLE) END AS minmax,
      |  CASE WHEN st.n < 2 OR (st.sxx - st.sx * st.sx / CAST(st.n AS DOUBLE)) / CAST(st.n - 1 AS DOUBLE) <= 0 THEN NULL
      |       ELSE (CAST(d.n_chars AS DOUBLE) - st.sx / CAST(st.n AS DOUBLE))
      |            / sqrt((st.sxx - st.sx * st.sx / CAST(st.n AS DOUBLE)) / CAST(st.n - 1 AS DOUBLE)) END AS zscore
      |FROM documents d JOIN st USING (source)""".stripMargin

  // ---- q77: categorical encoding — per-segment frequency + smoothed
  //      (m-estimate) target encoding of order totals. ----
  val q77TargetEncode: Q = (s, d) => {
    val df = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
    FeatureEncoding.targetEncode(df, "c_mktsegment", "o_totalprice", m = 10)
  }

  val q77Oracle: String =
    """WITH df AS (SELECT c_mktsegment, o_totalprice
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |pc AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
      |  FROM df GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS st FROM df)
      |SELECT c_mktsegment, n,
      |  CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) AS freq,
      |  s / CAST(n AS DOUBLE) AS target_mean,
      |  (s + 10.0 * (st / CAST(nt AS DOUBLE))) / CAST(n + 10 AS DOUBLE) AS target_enc
      |FROM pc, tot""".stripMargin

  // ---- q78: Jaro-Winkler fuzzy matching of part names — blocked on
  //      the last name token (|block|² bounded, hot blocks excluded
  //      by the same BETWEEN filter in engine and oracle), scored by
  //      the native codegen expression (plans.JaroWinkler). Band =
  //      floor(jw*100): floor of an identical double is identical,
  //      with no round-half tie semantics in play. ----
  val q78JaroDedup: Q = (s, d) => {
    GraftFunctions.register(s)
    val names = part(s, d).select(col("p_name")).distinct()
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val ok = names.groupBy(col("blk"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").between(2, 1000)).select("blk")
    val blocked = names.join(ok, Seq("blk"))
    val a = blocked.select(col("blk"), col("p_name").as("na"))
    val b = blocked.select(col("blk"), col("p_name").as("nb"))
    a.join(b, Seq("blk")).filter(col("na") < col("nb"))
      .withColumn("jw", GraftFunctions.jaroWinklerFast(col("na"), col("nb")))
      .filter(col("jw") >= 0.94)
      .select(col("na"), col("nb"),
        floor(col("jw") * 100).cast("long").as("jw_band"))
  }

  val q78Oracle: String =
    """WITH n AS (SELECT DISTINCT p_name FROM part),
      |nb AS (SELECT p_name, split_part(p_name, ' ', -1) AS blk FROM n),
      |ok AS (SELECT blk FROM nb GROUP BY blk HAVING COUNT(*) BETWEEN 2 AND 1000),
      |bl AS (SELECT nb.p_name, nb.blk FROM nb JOIN ok USING (blk))
      |SELECT a.p_name AS na, b.p_name AS nb,
      |  CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name) * 100) AS BIGINT) AS jw_band
      |FROM bl a JOIN bl b ON a.blk = b.blk AND a.p_name < b.p_name
      |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.94""".stripMargin

  // ---- q79: sweep-line concurrency — how many orders are "open"
  //      (placed, not yet fully shipped) each day; monthly peak and
  //      its first day. ±1 deltas aggregate to one row per day
  //      (tiny), then the distributed prefix sum (PrefixSum — never
  //      a single-task global window) turns deltas into levels. ----
  val q79OpenOrders: Q = (s, d) => {
    val o = orders(s, d).select(col("o_orderkey"),
      to_date(col("o_orderdate")).as("start_day"))
    val ship = lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("last_ship"))
    val iv = o.join(ship, col("o_orderkey") === col("l_orderkey"))
      .select(col("start_day"), date_add(col("last_ship"), 1).as("end_day"))
    val deltas = iv.select(col("start_day").as("day"), lit(1L).as("delta"))
      .unionByName(iv.select(col("end_day").as("day"), lit(-1L).as("delta")))
      .groupBy(col("day")).agg(sum(col("delta")).as("delta"))
    val open = PrefixSum.runningTotal(deltas, "day", "delta", "open")
      .select(col("day"), col("open").cast("long").as("open"))
    val monthly = open.withColumn("month",
      date_trunc("month", col("day")).cast("date"))
    val mx = monthly.groupBy(col("month"))
      .agg(max(col("open")).as("max_open"))
    monthly.join(mx, Seq("month"))
      .filter(col("open") === col("max_open"))
      .groupBy(col("month"), col("max_open"))
      .agg(min(col("day")).as("peak_day"))
  }

  val q79Oracle: String =
    """WITH iv AS (
      |  SELECT CAST(o_orderdate AS DATE) AS start_day,
      |    CAST(MAX(CAST(l_shipdate AS DATE)) + INTERVAL 1 DAY AS DATE) AS end_day
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY o_orderkey, CAST(o_orderdate AS DATE)),
      |deltas AS (
      |  SELECT day, CAST(SUM(delta) AS BIGINT) AS delta FROM (
      |    SELECT start_day AS day, 1 AS delta FROM iv
      |    UNION ALL SELECT end_day, -1 FROM iv) u GROUP BY day),
      |op AS (SELECT day,
      |  CAST(SUM(delta) OVER (ORDER BY day) AS BIGINT) AS open FROM deltas),
      |m AS (SELECT CAST(date_trunc('month', day) AS DATE) AS month, day, open FROM op),
      |mx AS (SELECT month, MAX(open) AS max_open FROM m GROUP BY month)
      |SELECT m.month, mx.max_open, MIN(m.day) AS peak_day
      |FROM m JOIN mx ON m.month = mx.month AND m.open = mx.max_open
      |GROUP BY m.month, mx.max_open""".stripMargin

  // ---- text_upsample: deterministic epoch upsampling — sources get
  //      fractional epoch weights (100/150/200/250 hundredths derived
  //      from the source id); whole copies for everyone, the
  //      fractional extra granted by engine-portable md5 bucket
  //      (operators.Sampling.epochUpsample). The oracle recomputes
  //      the replication AND the md5 choice end-to-end. ----
  val textUpsample: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"), col("source"))
      .withColumn("w_pct",
        (lit(100L) + substring(col("source"), 4, 10).cast("long") % 4L * 50L))
    Sampling.epochUpsample(docs, "doc_id", col("w_pct"))
      .select(col("doc_id"), col("source"), col("copy"))
  }

  val textUpsampleOracle: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    100 + (CAST(substr(source, 4) AS BIGINT) % 4) * 50 AS w
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source,
      |    w // 100 + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':upsample'), 1, 8)) AS BIGINT) % 100 < w % 100
      |               THEN 1 ELSE 0 END AS n_copies
      |  FROM t)
      |SELECT doc_id, source, CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy
      |FROM c WHERE n_copies > 0""".stripMargin

  // ---- text_pmi: PMI collocations — top bigrams by pointwise mutual
  //      information. The global N factors cancel in the RANKING, so
  //      the score is the exact integer n_xy·10⁹ div (n_x·n_y) — no
  //      log, no float, no cross-engine drift; ties break on the
  //      bigram itself.
  //
  //      Hash-first (the text_top_ngrams two-phase idiom): phase 1
  //      counts and ranks on 8-byte xxhash64 token hashes — every
  //      exchange (unigram agg, bigram agg, the two count joins)
  //      carries longs, never words — and keeps the candidate
  //      superset at or above the provisional 50th score. Phase 2
  //      recovers strings for CANDIDATE pairs only (one scan,
  //      broadcast semi-join) and re-ranks with the string
  //      tie-break, so a hash-order tie at the cut can only widen
  //      the candidate set, never change the answer. Implausible
  //      tie plateaus (>10k) fall back to the direct string
  //      pipeline. Occurrence counts (not per-doc distinct). ----
  val textPmi: Q = (s, d) => {
    import graft.functions.wsTokens
    val docs = documents(s, d).select(wsTokens(col("text")).as("toks"))
      .localCheckpoint(true) // phase-1 aggregates + phase-2 recovery scan
    def pairsOf(c: org.apache.spark.sql.Column) = explode(
      zip_with(
        slice(c, lit(1), size(c) - 1),
        slice(c, lit(2), size(c) - 1),
        (x, y) => struct(x.as("w1"), y.as("w2"))))
    val score = expr("n_xy * 1000000000 div (n_x * n_y)")

    // phase 1: all-long ranking
    val uniH = docs.select(explode(col("toks")).as("tok"))
      .select(xxhash64(col("tok")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).cast("bigint").as("n_tok"))
      .localCheckpoint(true)
    val biH = docs.select(pairsOf(col("toks")).as("p"))
      .select(xxhash64(col("p.w1")).as("h1"), xxhash64(col("p.w2")).as("h2"))
      .groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).cast("bigint").as("n_xy"))
      .filter(col("n_xy") >= 5)
    val scoredH = biH
      .join(uniH.select(col("h").as("h1"), col("n_tok").as("n_x")), Seq("h1"))
      .join(uniH.select(col("h").as("h2"), col("n_tok").as("n_y")), Seq("h2"))
      .withColumn("pmi_scaled", score)
    val cutoff = scoredH.orderBy(col("pmi_scaled").desc).limit(50)
      .agg(min(col("pmi_scaled")).as("m"))
    val candRows = scoredH.join(broadcast(cutoff), col("pmi_scaled") >= col("m"))
      .select(col("h1"), col("h2"), col("n_xy"), col("n_x"), col("n_y"),
        col("pmi_scaled"))
      .limit(10001).collect() // model-sized: top-50 + score ties

    val strPairs = docs.select(pairsOf(col("toks")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    if (candRows.length > 10000) {
      // degenerate tie plateau: rank strings directly
      val uni = docs.select(explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).cast("bigint").as("n_tok"))
        .localCheckpoint(true)
      strPairs.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).cast("bigint").as("n_xy"))
        .filter(col("n_xy") >= 5)
        .join(uni.select(col("tok").as("w1"), col("n_tok").as("n_x")), Seq("w1"))
        .join(uni.select(col("tok").as("w2"), col("n_tok").as("n_y")), Seq("w2"))
        .withColumn("pmi_scaled", score)
        .orderBy(col("pmi_scaled").desc, col("w1").asc, col("w2").asc)
        .limit(50)
        .select(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"),
          col("pmi_scaled"))
    } else {
      // phase 2: strings for candidates only, exact string tie-break
      val cands = s.createDataFrame(
        java.util.Arrays.asList(candRows: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("h1",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("h2",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_xy",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_x",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_y",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("pmi_scaled",
            org.apache.spark.sql.types.LongType))))
      strPairs
        .withColumn("h1", xxhash64(col("w1")))
        .withColumn("h2", xxhash64(col("w2")))
        .join(broadcast(cands), Seq("h1", "h2"))
        .groupBy(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"),
          col("pmi_scaled"))
        .agg(count(lit(1)).as("__seen")).drop("__seen")
        .orderBy(col("pmi_scaled").desc, col("w1").asc, col("w2").asc)
        .limit(50)
        .select(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"),
          col("pmi_scaled"))
    }
  }

  val textPmiOracle: String =
    """WITH t AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
      |u AS (SELECT unnest(toks) AS tok FROM t),
      |uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_tok FROM u GROUP BY tok),
      |b AS (SELECT unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bigram FROM t),
      |bi AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_xy FROM b GROUP BY bigram HAVING COUNT(*) >= 5),
      |sp AS (SELECT bigram, n_xy, split_part(bigram, ' ', 1) AS w1, split_part(bigram, ' ', 2) AS w2 FROM bi)
      |SELECT sp.w1, sp.w2, sp.n_xy, ux.n_tok AS n_x, uy.n_tok AS n_y,
      |  (sp.n_xy * 1000000000) // (ux.n_tok * uy.n_tok) AS pmi_scaled
      |FROM sp JOIN uni ux ON sp.w1 = ux.tok JOIN uni uy ON sp.w2 = uy.tok
      |ORDER BY pmi_scaled DESC, sp.w1 ASC, sp.w2 ASC LIMIT 50""".stripMargin

  // ---- text_vocab_coverage: what fraction of all token occurrences
  //      the top-K vocabulary types cover (the OOV-rate planning
  //      curve for tokenizer sizing). The vocab aggregation runs
  //      once (checkpointed); each K is a TakeOrdered over the
  //      vocab-sized table, never a global sort of the corpus. ----
  val textVocabCoverage: Q = (s, d) => {
    import graft.functions.wsTokens
    val uni = documents(s, d)
      .select(explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).cast("bigint").as("n"))
      .localCheckpoint(true)
    val total = uni.agg(sum(col("n")).cast("bigint")).collect()(0).getLong(0)
    val parts = Seq(100, 1000, 10000).map { k =>
      uni.orderBy(col("n").desc, col("tok").asc).limit(k)
        .agg(count(lit(1)).cast("bigint").as("n_types"),
          sum(col("n")).cast("bigint").as("covered"))
        .withColumn("vocab_top", lit(k.toLong))
    }
    parts.reduce(_ unionByName _)
      .withColumn("total_tokens", lit(total))
      .withColumn("coverage",
        col("covered").cast("double") / col("total_tokens").cast("double"))
      .select(col("vocab_top"), col("n_types"), col("covered"),
        col("total_tokens"), col("coverage"))
  }

  val textVocabCoverageOracle: String =
    """WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents),
      |uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY tok),
      |r AS (SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS rk FROM uni),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens FROM uni),
      |k(vocab_top) AS (SELECT * FROM (VALUES (100),(1000),(10000)) v(x))
      |SELECT CAST(k.vocab_top AS BIGINT) AS vocab_top,
      |  CAST(COUNT(*) AS BIGINT) AS n_types,
      |  CAST(SUM(r.n) AS BIGINT) AS covered,
      |  tot.total_tokens,
      |  CAST(SUM(r.n) AS DOUBLE) / CAST(tot.total_tokens AS DOUBLE) AS coverage
      |FROM r, tot, k WHERE r.rk <= k.vocab_top
      |GROUP BY k.vocab_top, tot.total_tokens""".stripMargin

  // ---- q80: sorted-neighborhood blocking (Hernández-Stolfo 1995) —
  //      the OTHER classic record-linkage candidate generator next to
  //      q66's token blocking: global order by the record key, each
  //      record paired with its w−1 successors. The global rank comes
  //      from the distributed Ranking operator (range partitions +
  //      offsets — never a single-task ROW_NUMBER window); successor
  //      pairing is an explode + equi-join on rank, so the candidate
  //      count is exactly (w−1)·N regardless of key skew — the
  //      property token blocking lacks. ----
  val q80SortedNeighborhood: Q = (s, d) => {
    val names = part(s, d).select(col("p_name")).distinct()
    val ranked = Ranking.globalRank(names, "p_name", "rn")
      .localCheckpoint(true) // probe + build sides must agree on ranks
    val probes = ranked
      .withColumn("i", explode(sequence(lit(1L), lit(4L))))
      .withColumn("rn2", col("rn") + col("i"))
      .select(col("p_name").as("na"), col("rn2"))
    probes.join(ranked.select(col("p_name").as("nb"),
        col("rn").as("rn2")), Seq("rn2"))
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("dist") <= 4)
      .select(col("na"), col("nb"), col("dist"))
  }

  val q80Oracle: String =
    """WITH n AS (SELECT DISTINCT p_name FROM part),
      |r AS (SELECT p_name, ROW_NUMBER() OVER (ORDER BY p_name) AS rn FROM n)
      |SELECT a.p_name AS na, b.p_name AS nb,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 4
      |WHERE levenshtein(a.p_name, b.p_name) <= 4""".stripMargin

  // ---- q81: chi-square contingency analysis — observed vs expected
  //      counts for segment × priority, with per-cell chi-square
  //      contributions. Per-cell output deliberately: summing float
  //      contributions would hang the result on engine-specific
  //      aggregation order; the cells themselves are exact-int-fed
  //      fixed formulas. ----
  val q81ChiSquare: Q = (s, d) => {
    val df = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
    val cells = df.groupBy(col("seg"), col("pri"))
      .agg(count(lit(1)).cast("bigint").as("observed"))
    val rowN = df.groupBy(col("seg")).agg(count(lit(1)).cast("bigint").as("row_n"))
    val colN = df.groupBy(col("pri")).agg(count(lit(1)).cast("bigint").as("col_n"))
    val tot = df.agg(count(lit(1)).cast("bigint").as("n"))
    val dObs = col("observed").cast("double")
    cells.join(broadcast(rowN), Seq("seg"))
      .join(broadcast(colN), Seq("pri"))
      .crossJoin(broadcast(tot))
      .withColumn("expected",
        (col("row_n") * col("col_n")).cast("double") / col("n").cast("double"))
      .withColumn("contrib",
        (dObs - col("expected")) * (dObs - col("expected")) / col("expected"))
      .select(col("seg"), col("pri"), col("observed"),
        col("expected"), col("contrib"))
  }

  val q81Oracle: String =
    """WITH df AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cells AS (SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS observed FROM df GROUP BY 1, 2),
      |r AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS row_n FROM df GROUP BY 1),
      |c AS (SELECT pri, CAST(COUNT(*) AS BIGINT) AS col_n FROM df GROUP BY 1),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM df)
      |SELECT cells.seg, cells.pri, cells.observed,
      |  CAST(r.row_n * c.col_n AS DOUBLE) / CAST(t.n AS DOUBLE) AS expected,
      |  (CAST(cells.observed AS DOUBLE) - CAST(r.row_n * c.col_n AS DOUBLE) / CAST(t.n AS DOUBLE))
      |    * (CAST(cells.observed AS DOUBLE) - CAST(r.row_n * c.col_n AS DOUBLE) / CAST(t.n AS DOUBLE))
      |    / (CAST(r.row_n * c.col_n AS DOUBLE) / CAST(t.n AS DOUBLE)) AS contrib
      |FROM cells JOIN r USING (seg) JOIN c USING (pri), t""".stripMargin

  // ---- q82: INCREMENTAL skyline maintenance — the CDC-view form of
  //      q73: under inserts, skyline(S ∪ T) = skyline(skyline(S) ∪ T),
  //      so each batch pays the (tiny) current frontier plus the
  //      batch. The oracle recomputes the frontier over the FULL
  //      table, independently proving the incremental identity. ----
  val q82SkylineIncremental: Q = (s, d) => {
    val p = part(s, d).select(col("p_partkey"),
      round(col("p_retailprice") * 100).cast("long").as("price_cents"),
      col("p_size").cast("long").as("size"))
    val sky1 = Skyline.pareto2d(p.filter(col("p_partkey") % 2 === 0),
      "price_cents", "size", col("p_partkey"))
    Skyline.insertMaintain(sky1, p.filter(col("p_partkey") % 2 === 1),
      "price_cents", "size", col("p_partkey"))
  }

  // ---- text_setsim_join: EXACT all-pairs set-similarity join via
  //      prefix filtering (no candidate ever dropped — the exactness
  //      complement of the capped minhash/ngram paths; see
  //      operators.SetSimJoin). Sets are distinct 64-bit 3-gram
  //      shingle hashes (3-grams, not bigrams: this corpus shares
  //      bigrams so broadly that even rare-first prefixes candidate
  //      ~half of all pairs — measured 7.0M bigram vs 0.3M trigram
  //      candidate pairs at sf0.1), so every exchange carries longs;
  //      the oracle recomputes on the STRINGS with the quadratic
  //      shared-shingle candidate join — two independent algorithms,
  //      one answer. ----
  val textSetSim: Q = (s, d) => {
    import graft.functions.wsTokens
    GraftFunctions.register(s)
    val sets = documents(s, d).select(col("doc_id"),
      GraftFunctions.shingleFast(wsTokens(col("text")), 3).as("shingles"))
    SetSimJoin.prefixFilterJoin(sets, "doc_id", "shingles", p = 3, q = 5)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        col("inter"), col("union_sz"))
  }

  val textSetSimOracle: String =
    """WITH docs AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks FROM documents),
      |sh AS (SELECT doc_id, list_distinct([toks[i]||' '||toks[i+1]||' '||toks[i+2]
      |                                     for i in range(1, len(toks)-1)]) g
      |       FROM docs WHERE len(toks) >= 3),
      |ex AS (SELECT doc_id, unnest(g) s FROM sh),
      |sz AS (SELECT doc_id, CAST(len(g) AS BIGINT) n FROM sh),
      |pairs AS (SELECT a.doc_id doc_a, b.doc_id doc_b, CAST(count(*) AS BIGINT) inter
      |          FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT doc_a, doc_b, inter, sa.n + sb.n - inter AS union_sz
      |FROM pairs JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
      |WHERE inter * 5 >= (sa.n + sb.n - inter) * 3""".stripMargin

  // ---- q83: two-sample Kolmogorov-Smirnov test — are two corpus
  //      halves drawn from the same length distribution? D =
  //      max |F1−F2| computed EXACTLY: per-value counts, CDFs via the
  //      distributed PrefixSum (value-keyed, never a single-task
  //      window over the corpus), and the max of the integer
  //      cross-difference |cum1·n2 − cum2·n1| — the float division
  //      happens once, on the final row. ----
  val q83KsTest: Q = (s, d) => {
    val docs = documents(s, d).select(col("n_chars"),
      (substring(col("source"), 4, 10).cast("long") < 10).as("isA"))
    val per = docs.groupBy(col("n_chars"))
      .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("isA"), 1L).otherwise(0L)).as("c2"))
      .localCheckpoint(true) // totals pass + two cumsum passes
    val tot = per.agg(sum(col("c1")), sum(col("c2"))).collect()(0)
    val n1 = tot.getLong(0)
    val n2 = tot.getLong(1)
    val cum = PrefixSum.runningTotal(
      PrefixSum.runningTotal(per, "n_chars", "c1", "cum1"),
      "n_chars", "c2", "cum2")
    cum.withColumn("ks_num",
        abs(col("cum1").cast("bigint") * n2 - col("cum2").cast("bigint") * n1))
      .orderBy(col("ks_num").desc, col("n_chars").asc).limit(1)
      .select(col("n_chars").as("at_value"), col("ks_num"),
        lit(n1).as("n1"), lit(n2).as("n2"),
        round(col("ks_num").cast("double") / lit(n1.toDouble * n2), 9).as("ks"))
  }

  val q83Oracle: String =
    """WITH d AS (SELECT n_chars, CAST(substr(source, 4) AS BIGINT) < 10 AS isA FROM documents),
      |per AS (SELECT n_chars,
      |  CAST(SUM(CASE WHEN isA THEN 1 ELSE 0 END) AS BIGINT) c1,
      |  CAST(SUM(CASE WHEN NOT isA THEN 1 ELSE 0 END) AS BIGINT) c2
      |  FROM d GROUP BY n_chars),
      |t AS (SELECT CAST(SUM(c1) AS BIGINT) n1, CAST(SUM(c2) AS BIGINT) n2 FROM per),
      |cum AS (SELECT n_chars,
      |  CAST(SUM(c1) OVER (ORDER BY n_chars) AS BIGINT) cum1,
      |  CAST(SUM(c2) OVER (ORDER BY n_chars) AS BIGINT) cum2 FROM per),
      |k AS (SELECT n_chars, ABS(cum1 * t.n2 - cum2 * t.n1) ks_num, t.n1, t.n2 FROM cum, t)
      |SELECT n_chars AS at_value, ks_num, n1, n2,
      |  ROUND(CAST(ks_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 9) AS ks
      |FROM k ORDER BY ks_num DESC, at_value ASC LIMIT 1""".stripMargin

  // ---- q84: per-group least-squares trend (the grouped form of
  //      q71): document length drift over ingestion order per
  //      source. Both slope AND intercept as single ratios of exact
  //      HUGEINT-algebra numerators — intercept is NOT derived from
  //      the rounded slope, so no error chaining; round(…, 9) for
  //      the HUGEINT→DOUBLE ulp gap (the q71 lesson). ----
  val q84GroupTrend: Q = (s, d) => {
    val e = documents(s, d).select(col("source"),
      col("doc_id").cast("decimal(38,0)").as("x"),
      col("n_chars").cast("decimal(38,0)").as("y"))
    e.groupBy(col("source"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("n").cast("bigint").as("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 9)
          .as("slope"),
        round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 9)
          .as("intercept"))
  }

  val q84Oracle: String =
    """WITH e AS (SELECT source, CAST(doc_id AS HUGEINT) x, CAST(n_chars AS HUGEINT) y FROM documents),
      |a AS (SELECT source, CAST(COUNT(*) AS HUGEINT) n,
      |  SUM(x) sx, SUM(y) sy, SUM(x * y) sxy, SUM(x * x) sxx
      |  FROM e GROUP BY 1)
      |SELECT source, CAST(n AS BIGINT) AS n,
      |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
      |    CAST(n * sxx - sx * sx AS DOUBLE), 9) AS slope,
      |  ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE) /
      |    CAST(n * sxx - sx * sx AS DOUBLE), 9) AS intercept
      |FROM a""".stripMargin

  // ---- q85: Benford first-digit audit of order totals — the
  //      financial data-quality screen (fabricated totals flunk the
  //      log curve). The digit comes from the INTEGER-cents string
  //      (integer→string is identical in every engine; a float
  //      format would not be), proportions are one exact division;
  //      the log-expectation comparison is the analyst's job, not
  //      the engine's — log10 ulps differ across engines. ----
  val q85Benford: Q = (s, d) => {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val digits = orders(s, d).select(
      substring(cents.cast("string"), 1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).cast("bigint").as("n"))
    val tot = digits.agg(sum(col("n")).cast("bigint").as("total"))
    digits.crossJoin(broadcast(tot))
      .withColumn("prop",
        round(col("n").cast("double") / col("total").cast("double"), 9))
      .select(col("digit"), col("n"), col("total"), col("prop"))
  }

  val q85Oracle: String =
    """WITH d AS (SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS digit FROM orders),
      |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) n FROM d GROUP BY digit),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) total FROM g)
      |SELECT digit, n, total,
      |  ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 9) AS prop
      |FROM g, t""".stripMargin

  // ---- q86: per-source ROBUST scaling — median/MAD robust z for
  //      every document (the outlier-immune sibling of q76; exact
  //      discrete medians via the q68 percentile_disc parity). ----
  val q86RobustScale: Q = (s, d) =>
    FeatureEncoding.robustScale(
      documents(s, d).select(col("doc_id"), col("source"), col("n_chars")),
      "source", "n_chars")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("median"), col("mad"), col("robust_z"))

  val q86Oracle: String =
    """WITH med AS (
      |  SELECT source, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS median
      |  FROM documents GROUP BY source),
      |dev AS (
      |  SELECT d.doc_id, d.source, d.n_chars, med.median,
      |    ABS(d.n_chars - med.median) AS dv
      |  FROM documents d JOIN med USING (source)),
      |mad AS (
      |  SELECT source, CAST(quantile_disc(dv, 0.5) AS BIGINT) AS mad
      |  FROM dev GROUP BY source)
      |SELECT dev.doc_id, dev.source, dev.n_chars, dev.median, mad.mad,
      |  CASE WHEN mad.mad = 0 THEN NULL
      |       ELSE CAST(dev.n_chars - dev.median AS DOUBLE) / CAST(mad.mad AS DOUBLE)
      |  END AS robust_z
      |FROM dev JOIN mad USING (source)""".stripMargin

  // ---- text_bootstrap: deterministic bootstrap resample — 1000
  //      draws with replacement, probability ∝ document length. Each
  //      draw is independently recomputable (md5(draw:salt) on the
  //      cumulative-weight axis); the oracle recomputes every draw
  //      and its interval lookup end-to-end. ----
  val textBootstrap: Q = (s, d) =>
    Sampling.bootstrapSample(
      documents(s, d).select(col("doc_id"), col("n_chars")),
      "doc_id", "n_chars", k = 1000)

  val textBootstrapOracle: String =
    """WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) w FROM documents WHERE n_chars > 0),
      |cum AS (SELECT doc_id, w, CAST(SUM(w) OVER (ORDER BY doc_id) AS BIGINT) cum FROM w),
      |t AS (SELECT CAST(SUM(w) AS BIGINT) total FROM w),
      |draws AS (
      |  SELECT g.i AS draw,
      |    CAST(('0x' || substr(md5(CAST(g.i AS VARCHAR) || ':boot'), 1, 13)) AS BIGINT) % t.total AS u
      |  FROM generate_series(0, 999) g(i), t)
      |SELECT d.draw, c.doc_id
      |FROM draws d JOIN cum c ON d.u >= c.cum - c.w AND d.u < c.cum""".stripMargin

  // ---- emb_label_sim: label-by-label semantic similarity matrix —
  //      cosine between per-label embedding centroids (the drift /
  //      class-overlap diagnostic). The centroid means are the
  //      round-6 values the emb_centroids oracle pins; from there
  //      everything is EXACT DECIMAL algebra (products and sums of
  //      decimal(18,6) — no float accumulation order anywhere), and
  //      the one double division + sqrt happens on the final row. ----
  val embLabelSim: Q = (s, d) => {
    val ex = embeddings(s, d).select(col("label"),
      posexplode(col("embedding")).as(Seq("pos", "v")))
    val m = ex.groupBy(col("label"), col("pos"))
      .agg(round(avg(col("v").cast("double")), 6)
        .cast("decimal(18,6)").as("m6"))
      .localCheckpoint(true) // dot pairs + norms
    val norms = m.groupBy(col("label"))
      .agg(sum((col("m6") * col("m6")).cast("decimal(38,12)")).as("nn"))
    val dots = m.select(col("label").as("label_a"), col("pos"), col("m6").as("ma"))
      .join(m.select(col("label").as("label_b"), col("pos"), col("m6").as("mb")),
        Seq("pos"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum((col("ma") * col("mb")).cast("decimal(38,12)")).as("dot"))
    dots
      .join(broadcast(norms.select(col("label").as("label_a"), col("nn").as("na"))), Seq("label_a"))
      .join(broadcast(norms.select(col("label").as("label_b"), col("nn").as("nb"))), Seq("label_b"))
      .select(col("label_a"), col("label_b"),
        round(col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6)
          .as("cosine"))
  }

  val embLabelSimOracle: String =
    """WITH ex AS (SELECT label, unnest(embedding) AS v,
      |                   unnest(range(len(embedding))) AS pos
      |            FROM embeddings),
      |m AS (SELECT label, pos,
      |             CAST(ROUND(AVG(CAST(v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS m6
      |      FROM ex GROUP BY 1, 2),
      |norms AS (SELECT label, SUM(CAST(m6 * m6 AS DECIMAL(38,12))) AS nn FROM m GROUP BY label),
      |dots AS (SELECT a.label AS label_a, b.label AS label_b,
      |               SUM(CAST(a.m6 * b.m6 AS DECIMAL(38,12))) AS dot
      |        FROM m a JOIN m b ON a.pos = b.pos AND a.label < b.label
      |        GROUP BY 1, 2)
      |SELECT d.label_a, d.label_b,
      |  ROUND(CAST(d.dot AS DOUBLE) /
      |    (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))), 6) AS cosine
      |FROM dots d JOIN norms na ON na.label = d.label_a
      |            JOIN norms nb ON nb.label = d.label_b""".stripMargin

  // ---- q87: OHLC bars — open/high/low/close of event values per
  //      day (the time-bucketed finance aggregate). Open/close via
  //      min_by/max_by on a single-scalar time key (DuckDB's max_by
  //      takes no struct keys — the q68 convention): micros-in-day
  //      · 2·10⁷ + event_id stays exact in a long and totally orders
  //      a day's events. One hash aggregation, cents exact. ----
  val q87Ohlc: Q = (s, d) => {
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val us = unix_micros(col("ts"))
    val key = (us % (86400L * 1000000L)) * 20000000L + col("event_id")
    events(s, d)
      .select(to_date(col("ts")).as("day"), cents.as("cents"), key.as("k"))
      .groupBy(col("day"))
      .agg(min_by(col("cents"), col("k")).as("open"),
        max(col("cents")).as("high"),
        min(col("cents")).as("low"),
        max_by(col("cents"), col("k")).as("close"),
        count(lit(1)).cast("bigint").as("n"))
  }

  val q87Oracle: String =
    """WITH e AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    (epoch_us(CAST(ts AS TIMESTAMP)) % CAST(86400000000 AS BIGINT)) * CAST(20000000 AS BIGINT) + event_id AS k
      |  FROM events)
      |SELECT day, min_by(cents, k) AS "open", MAX(cents) AS high,
      |  MIN(cents) AS low, max_by(cents, k) AS "close",
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM e GROUP BY day""".stripMargin

  // ---- q88: top session paths — the 20 most common first-5-event
  //      journeys (q17's gap sessionization, then an ordered path
  //      string). The collect is per-session (bounded by session
  //      length), ordering pinned by (ts, event_id). ----
  val q88TopPaths: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val sess = events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > lit(1800L * 1000000L), 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val paths = sess.groupBy(col("user_id"), col("session_no"))
      .agg(array_join(
        slice(transform(
          sort_array(collect_list(struct(
            unix_micros(col("ts")).as("us"), col("event_id").as("eid"),
            col("event_type").as("t")))),
          e => e.getField("t")), 1, 5), ">").as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).cast("bigint").as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(20)
  }

  val q88Oracle: String =
    """WITH g AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |    LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
      |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
      |  FROM events),
      |m AS (SELECT *, CASE WHEN prev_us IS NULL
      |    OR epoch_us(ts) - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM g),
      |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM m),
      |p AS (SELECT user_id, session_no,
      |    array_to_string(list(event_type ORDER BY ts ASC, event_id ASC)[1:5], '>') AS path
      |  FROM s GROUP BY user_id, session_no)
      |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      |FROM p GROUP BY path
      |ORDER BY n_sessions DESC, path ASC LIMIT 20""".stripMargin

  // ---- q89: CUSUM change-point detection over the daily event
  //      volume — the day where the series' mean most decisively
  //      shifts. Classic CUSUM made EXACT: the deviation-from-mean
  //      cumulative sum is scaled by the day count K so
  //      D_k = K·S_k − k·S_K needs no division; prefix sums come
  //      from the distributed PrefixSum; one double division (the
  //      normalized statistic) on the final row. ----
  val q89Changepoint: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint(true)
    val tot = daily.agg(count(lit(1)).cast("long"), sum(col("c")).cast("long"))
      .collect()(0)
    val k = tot.getLong(0)
    val sTot = tot.getLong(1)
    // rank = running count of days — a second PrefixSum pass, never a
    // global ROW_NUMBER window (constant partition keys fold away and
    // the plan degenerates to one task; PlanAudit flags it)
    val cum = PrefixSum.runningTotal(
      PrefixSum.runningTotal(daily.withColumn("__one", lit(1L)),
        "day", "c", "s_k"),
      "day", "__one", "rank")
      .withColumn("s_k", col("s_k").cast("long"))
      .withColumn("rank", col("rank").cast("long"))
    cum.withColumn("d_k", abs(col("s_k") * k - col("rank") * sTot))
      .orderBy(col("d_k").desc, col("day").asc).limit(1)
      .select(col("day").as("change_day"), col("d_k"),
        lit(k).as("n_days"), lit(sTot).as("total_events"),
        round(col("d_k").cast("double") / lit(k.toDouble * sTot), 9).as("stat"))
  }

  val q89Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) k, CAST(SUM(c) AS BIGINT) s FROM daily),
      |cum AS (SELECT day,
      |  CAST(SUM(c) OVER (ORDER BY day) AS BIGINT) s_k,
      |  CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) rank FROM daily)
      |SELECT day AS change_day, ABS(s_k * t.k - rank * t.s) AS d_k,
      |  t.k AS n_days, t.s AS total_events,
      |  ROUND(CAST(ABS(s_k * t.k - rank * t.s) AS DOUBLE) /
      |    (CAST(t.k AS DOUBLE) * CAST(t.s AS DOUBLE)), 9) AS stat
      |FROM cum, t ORDER BY d_k DESC, change_day ASC LIMIT 1""".stripMargin

  // ---- text_url_canon: URL canonicalization parity — the URLs are
  //      CONSTRUCTED identically from columns on both sides (the
  //      corpus has no URL column), so what the oracle actually
  //      checks is the canonicalization algebra: host/scheme
  //      lowering, fragment and utm_* dropping, parameter sorting —
  //      re-derived independently in DuckDB list functions. ----
  val textUrlCanon: Q = (s, d) => {
    val url = concat(lit("HTTPS://"), upper(col("source")),
      lit(".Example.COM/Doc/"), col("doc_id").cast("string"),
      lit("?utm_source=feed&z="), col("doc_id").cast("string"),
      lit("&a="), col("source"), lit("#frag"))
    documents(s, d).select(col("doc_id"), url.as("url"))
      .withColumn("canonical",
        graft.operators.TextAnalysis.canonicalizeUrl(col("url")))
  }

  val textUrlCanonOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    'HTTPS://' || upper(source) || '.Example.COM/Doc/' || CAST(doc_id AS VARCHAR)
      |      || '?utm_source=feed&z=' || CAST(doc_id AS VARCHAR)
      |      || '&a=' || source || '#frag' AS url
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, url,
      |    split_part(url, '#', 1) AS nofrag,
      |    split_part(split_part(url, '#', 1), '?', 1) AS base
      |  FROM t),
      |q AS (
      |  SELECT doc_id, url, base,
      |    CASE WHEN instr(nofrag, '?') > 0 THEN split_part(nofrag, '?', -1) ELSE '' END AS qstr
      |  FROM p),
      |s AS (
      |  SELECT doc_id, url, base,
      |    list_sort(list_filter(string_split(qstr, '&'),
      |      x -> x NOT LIKE 'utm\_%' ESCAPE '\' AND x <> '')) AS params,
      |    split_part(base, '://', 1) AS scheme,
      |    split_part(base, '://', -1) AS rest
      |  FROM q)
      |SELECT doc_id, url,
      |  lower(scheme) || '://' || lower(split_part(rest, '/', 1))
      |    || substr(rest, length(split_part(rest, '/', 1)) + 1)
      |    || CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END
      |  AS canonical
      |FROM s""".stripMargin

  // ---- text_fix_mojibake: repair UTF-8-as-Latin-1 double encoding
  //      (rows-only: the strict-decoder repair has no DuckDB
  //      equivalent; the expression is spec-pinned on crafted
  //      corruption pairs). Corruption is INJECTED deterministically
  //      here — encode the text's codepoints as UTF-8 bytes read back
  //      as chars — then repaired; `repaired` counts how many rows
  //      the expression restored byte-identically. ----
  val textFixMojibake: Q = (s, d) => {
    GraftFunctions.register(s)
    // the synthetic corpus is pure ASCII (where corrupt == repair ==
    // identity), so a non-ASCII tail makes the round-trip REAL: its
    // UTF-8 bytes misread as Latin-1 genuinely garble, and only a
    // correct strict-decode repair restores byte identity
    val marked = concat(col("text"), lit(" café naïve №42"))
    val corrupted = expr(
      "decode(encode(concat(text, ' café naïve №42'), 'UTF-8'), 'ISO-8859-1')")
    documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), marked.as("marked"), corrupted.as("bad"),
        GraftFunctions.fixMojibakeFast(corrupted).as("fixed"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col("bad") =!= col("marked"), 1L).otherwise(0L))
          .cast("bigint").as("corrupted"),
        sum(when(col("fixed") === col("marked"), 1L).otherwise(0L))
          .cast("bigint").as("repaired"))
  }

  // ---- q90: interval coalescing (islands & gaps) — merge each
  //      customer's overlapping order-activity intervals into maximal
  //      busy spans. The island boundary is "start strictly after the
  //      running max end so far" — a prefix-max window PARTITIONED by
  //      customer (bounded state), exact integer dates. ----
  val q90IntervalMerge: Q = (s, d) => {
    val o = orders(s, d).select(col("o_orderkey"), col("o_custkey"),
      to_date(col("o_orderdate")).as("start_day"))
    val ship = lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("end_day"))
    val iv = o.join(ship, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("o_orderkey").as("ok"),
        col("start_day"), col("end_day"))
    val w = Window.partitionBy(col("cust"))
      .orderBy(col("start_day"), col("end_day"), col("ok"))
    val prevMaxEnd = max(col("end_day"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = iv
      .withColumn("new_island",
        when(prevMaxEnd.isNull || col("start_day") > prevMaxEnd, 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("cust"), col("island"))
      .agg(count(lit(1)).cast("bigint").as("n_orders"),
        min(col("start_day")).as("span_start"),
        max(col("end_day")).as("span_end"))
    islands.groupBy(col("cust"))
      .agg(count(lit(1)).cast("bigint").as("n_islands"),
        max(col("n_orders")).as("busiest_island"),
        sum(datediff(col("span_end"), col("span_start")) + 1)
          .cast("bigint").as("covered_days"))
  }

  val q90Oracle: String =
    """WITH ship AS (
      |  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS end_day
      |  FROM lineitem GROUP BY 1),
      |iv AS (
      |  SELECT o_custkey AS cust, o_orderkey AS ok,
      |    CAST(o_orderdate AS DATE) AS start_day, ship.end_day
      |  FROM orders JOIN ship ON o_orderkey = l_orderkey),
      |m AS (
      |  SELECT *, MAX(end_day) OVER (PARTITION BY cust
      |      ORDER BY start_day, end_day, ok
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
      |  FROM iv),
      |f AS (
      |  SELECT *, CASE WHEN prev_max_end IS NULL OR start_day > prev_max_end
      |    THEN 1 ELSE 0 END AS new_island FROM m),
      |g AS (
      |  SELECT *, SUM(new_island) OVER (PARTITION BY cust
      |      ORDER BY start_day, end_day, ok
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM f),
      |i AS (
      |  SELECT cust, island, CAST(COUNT(*) AS BIGINT) n_orders,
      |    MIN(start_day) span_start, MAX(end_day) span_end
      |  FROM g GROUP BY 1, 2)
      |SELECT cust, CAST(COUNT(*) AS BIGINT) AS n_islands,
      |  MAX(n_orders) AS busiest_island,
      |  CAST(SUM(date_diff('day', span_start, span_end) + 1) AS BIGINT) AS covered_days
      |FROM i GROUP BY cust""".stripMargin

  // ---- q91: gapped sequential pairs (PrefixSpan-lite) — which event
  //      types follow which within a session, allowing up to 3
  //      intervening events (q63's transition matrix is the gap-0
  //      case). Pair generation is an explode of 4 rank offsets + an
  //      equi-join on (user, session, rank) — candidate volume is
  //      exactly 4·N, skew-immune, never a session self-join. ----
  val q91GappedPairs: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val sess = events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > lit(1800L * 1000000L), 1L)
          .otherwise(0L))
      .withColumn("session_no",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("session_no"))
          .orderBy(col("ts").asc, col("event_id").asc)))
      .select(col("user_id"), col("session_no"), col("rn"),
        col("event_type"))
      .localCheckpoint(true) // probe + build sides of the offset join
    val probes = sess
      .withColumn("d", explode(sequence(lit(1), lit(4))))
      .select(col("user_id"), col("session_no"),
        (col("rn") + col("d")).as("rn"), col("event_type").as("from_type"),
        col("d").as("gap"))
    probes.join(sess.withColumnRenamed("event_type", "to_type"),
        Seq("user_id", "session_no", "rn"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        count(when(col("gap") === 1, 1)).cast("bigint").as("n_adjacent"))
      .orderBy(col("n_pairs").desc, col("from_type").asc, col("to_type").asc)
      .limit(20)
  }

  val q91Oracle: String =
    """WITH g AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |    LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
      |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
      |  FROM events),
      |m AS (SELECT *, CASE WHEN prev_us IS NULL
      |    OR epoch_us(ts) - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM g),
      |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM m),
      |r AS (SELECT user_id, session_no, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, session_no
      |      ORDER BY ts ASC, event_id ASC) AS rn
      |  FROM s)
      |SELECT a.event_type AS from_type, b.event_type AS to_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(COUNT(CASE WHEN b.rn - a.rn = 1 THEN 1 END) AS BIGINT) AS n_adjacent
      |FROM r a JOIN r b
      |  ON a.user_id = b.user_id AND a.session_no = b.session_no
      | AND b.rn - a.rn BETWEEN 1 AND 4
      |GROUP BY 1, 2
      |ORDER BY n_pairs DESC, from_type ASC, to_type ASC LIMIT 20""".stripMargin

  // ---- q92: sliding-window distinct count — distinct active users
  //      over the trailing 7 days, per day. Exact and declarative
  //      WITHOUT per-day set state: dedup to (day, user) once, then
  //      each pair votes for the 7 window-end days it belongs to
  //      (explode — a bounded 7× blowup), then one count-distinct per
  //      day. Skew-immune: the blowup factor is the window length,
  //      never the key frequency. ----
  val q92SlidingDistinct: Q = (s, d) => {
    val dayUser = events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val votes = dayUser
      .withColumn("w_end", explode(sequence(col("day"),
        date_add(col("day"), 6))))
    val bounds = dayUser.agg(min(col("day")), max(col("day"))).collect()(0)
    votes.filter(col("w_end") <= lit(bounds.getDate(1)))
      .groupBy(col("w_end").as("day"))
      .agg(count_distinct(col("user_id")).cast("bigint").as("active_7d"))
  }

  val q92Oracle: String =
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |b AS (SELECT MAX(day) AS mx FROM du),
      |v AS (SELECT CAST(unnest(range(0, 7)) AS BIGINT) AS o, day, user_id FROM du)
      |SELECT CAST(v.day + CAST(v.o AS INTEGER) AS DATE) AS day,
      |  CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS active_7d
      |FROM v, b WHERE v.day + CAST(v.o AS INTEGER) <= b.mx
      |GROUP BY 1""".stripMargin

  // ---- q93: exact weighted median — the order price at which half
  //      the shipped QUANTITY sits below (the "typical dollar" is not
  //      the typical row). No sort of raw data: aggregate to
  //      (price_cents → total weight) first (value-cardinality), then
  //      the distributed PrefixSum walks the cumulative weight axis
  //      and the answer is the first value whose running weight
  //      reaches half the total — exact integer comparison, ties
  //      deterministic. ----
  val q93WeightedMedian: Q = (s, d) => {
    val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val perValue = lineitem(s, d)
      .select(cents.as("v"), col("l_quantity").cast("long").as("q"))
      .groupBy(col("v")).agg(sum(col("q")).as("w"))
      .localCheckpoint(true)
    val total = perValue.agg(sum(col("w")).cast("long")).collect()(0).getLong(0)
    val cum = PrefixSum.runningTotal(perValue, "v", "w", "cw")
      .withColumn("cw", col("cw").cast("long"))
    cum.filter(col("cw") * 2 >= total)
      .orderBy(col("v").asc).limit(1)
      .select(col("v").as("weighted_median_cents"),
        col("cw").as("cum_weight"), lit(total).as("total_weight"))
  }

  val q93Oracle: String =
    """WITH pv AS (
      |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(SUM(w) AS BIGINT) AS total FROM pv),
      |c AS (SELECT v, CAST(SUM(w) OVER (ORDER BY v) AS BIGINT) AS cw FROM pv)
      |SELECT c.v AS weighted_median_cents, c.cw AS cum_weight, t.total AS total_weight
      |FROM c, t WHERE c.cw * 2 >= t.total
      |ORDER BY c.v ASC LIMIT 1""".stripMargin

  // ---- q94: column-level churn between snapshots — which columns
  //      drive the updates (the cdc_snapshot_diff scenario, one level
  //      deeper): v1/v2 synthesized as in that query, plus a user_id
  //      reassignment on %5 rows so BOTH payload columns churn at
  //      different rates. Output is schema-sized. ----
  val q94ColumnChurn: Q = (s, d) => {
    val base = events(s, d).select(col("event_id"), col("user_id"), col("value"))
    val v1 = base.filter(col("event_id") < 8000)
    val v2 = base.filter(col("event_id") >= 2000)
      .withColumn("value",
        when(col("event_id") % 3 === 0, col("value") * 2).otherwise(col("value")))
      .withColumn("user_id",
        when(col("event_id") % 5 === 0, col("user_id") + 1).otherwise(col("user_id")))
    graft.cdc.SnapshotDiff.columnChurn(v1, v2, Seq("event_id"))
  }

  val q94Oracle: String =
    """WITH v1 AS (SELECT event_id, user_id, value FROM events WHERE event_id < 8000),
      |v2 AS (SELECT event_id,
      |         CASE WHEN event_id % 5 = 0 THEN user_id + 1 ELSE user_id END AS user_id,
      |         CASE WHEN event_id % 3 = 0 THEN value * 2 ELSE value END AS value
      |       FROM events WHERE event_id >= 2000),
      |j AS (SELECT v1.event_id AS l_id, v2.event_id AS r_id,
      |        v1.user_id AS l_u, v2.user_id AS r_u,
      |        v1.value AS l_v, v2.value AS r_v
      |      FROM v1 FULL OUTER JOIN v2 ON v1.event_id = v2.event_id),
      |a AS (SELECT
      |  CAST(SUM(CASE WHEN l_id IS NOT NULL AND r_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
      |  CAST(SUM(CASE WHEN l_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
      |  CAST(SUM(CASE WHEN r_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
      |  CAST(SUM(CASE WHEN l_id IS NOT NULL AND r_id IS NOT NULL
      |    AND NOT (l_u IS NOT DISTINCT FROM r_u) THEN 1 ELSE 0 END) AS BIGINT) AS chg_user,
      |  CAST(SUM(CASE WHEN l_id IS NOT NULL AND r_id IS NOT NULL
      |    AND NOT (l_v IS NOT DISTINCT FROM r_v) THEN 1 ELSE 0 END) AS BIGINT) AS chg_value
      |  FROM j)
      |SELECT 'user_id' AS col_name, chg_user AS n_changed, n_overlap, n_inserted, n_deleted FROM a
      |UNION ALL
      |SELECT 'value', chg_value, n_overlap, n_inserted, n_deleted FROM a""".stripMargin

  // ---- q95: bootstrap confidence interval for the median document
  //      length — fully DETERMINISTIC: B=100 uniform resamples from
  //      md5 rank draws (Sampling.bootstrapResamples), per-resample
  //      exact discrete median, CI = the 2.5%/97.5% discrete
  //      percentiles of the B medians. Every intermediate is an
  //      integer; the oracle replays all B·n draws. ----
  val q95BootstrapCi: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"), col("n_chars"))
    val res = Sampling.bootstrapResamples(docs, "doc_id", b = 100)
    val medians = res.groupBy(col("resample"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
        .cast("long").as("med"))
    medians.agg(
      expr("percentile_disc(0.025) WITHIN GROUP (ORDER BY med)")
        .cast("long").as("ci_lo"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY med)")
        .cast("long").as("ci_mid"),
      expr("percentile_disc(0.975) WITHIN GROUP (ORDER BY med)")
        .cast("long").as("ci_hi"),
      count(lit(1)).cast("bigint").as("n_resamples"))
  }

  val q95Oracle: String =
    """WITH r AS (
      |  SELECT doc_id, n_chars,
      |    ROW_NUMBER() OVER (ORDER BY doc_id) AS rk
      |  FROM documents),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      |draws AS (
      |  SELECT b.b AS resample,
      |    CAST(('0x' || substr(md5(CAST(b.b * n.n + r2.rk - 1 AS VARCHAR) || ':bootci'), 1, 13)) AS BIGINT) % n.n + 1 AS rk
      |  FROM generate_series(0, 99) b(b), n, r r2),
      |m AS (
      |  SELECT d.resample, CAST(quantile_disc(r.n_chars, 0.5) AS BIGINT) AS med
      |  FROM draws d JOIN r ON d.rk = r.rk GROUP BY d.resample)
      |SELECT CAST(quantile_disc(med, 0.025) AS BIGINT) AS ci_lo,
      |  CAST(quantile_disc(med, 0.5) AS BIGINT) AS ci_mid,
      |  CAST(quantile_disc(med, 0.975) AS BIGINT) AS ci_hi,
      |  CAST(COUNT(*) AS BIGINT) AS n_resamples
      |FROM m""".stripMargin

  // ---- q96: Pareto contribution report — which sources make up 80%
  //      of the corpus tokens (the 80/20 audit behind mixture
  //      weighting decisions). Group totals are source-cardinality,
  //      so the ordered cumulative walk is over a model-sized table;
  //      shares are exact-integer cumulative sums with one division
  //      per row; the 80% frontier flag is an exact integer compare
  //      (cum·5 ≥ total·4). ----
  val q96ParetoReport: Q = (s, d) => {
    import graft.functions.wsTokens
    val perSource = documents(s, d)
      .select(col("source"), size(wsTokens(col("text"))).cast("long").as("t"))
      .groupBy(col("source")).agg(sum(col("t")).as("tokens"))
      .localCheckpoint(true)
    paretoReport(perSource, "source", "tokens")
  }

  /** Ordered cumulative Pareto walk over a GROUPED totals table. The
    * grouped table must be model-sized (|groups| rows): the walk
    * collects it to the driver (the q54 model-sized-collect
    * convention — an unpartitioned window here would trip the
    * PlanAudit gate for no benefit), so the cardinality is GUARDED:
    * more than `maxGroups` groups fails fast naming the knob, instead
    * of collecting unbounded rows into driver memory.
    */
  def paretoReport(perGroup: DataFrame, groupCol: String, valueCol: String,
                   maxGroups: Long = 100000L): DataFrame = {
    val s = perGroup.sparkSession
    val n = perGroup.count()
    require(n <= maxGroups,
      s"paretoReport: $n groups exceeds maxGroups=$maxGroups — the " +
        "cumulative walk collects the grouped table to the driver; " +
        "raise maxGroups only if the group column is genuinely " +
        "model-sized, or pre-aggregate to a coarser grouping")
    val rows = perGroup
      .select(col(groupCol).cast("string"), col(valueCol).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (src, t) => (-t, src) }
    val total = rows.map(_._2).sum
    // ROUND(x, 9) with half-up on the exact binary value — the same
    // rule Spark's round() and the oracle's ROUND apply (math.rint
    // would be half-EVEN and could differ at a .5 boundary)
    def r9(x: Double): Double = BigDecimal(x)
      .setScale(9, scala.math.BigDecimal.RoundingMode.HALF_UP).doubleValue
    var cum = 0L
    val report = rows.zipWithIndex.map { case ((src, t), i) =>
      val before = cum
      cum += t
      (i + 1, src, t, cum,
        r9(t.toDouble / total), r9(cum.toDouble / total),
        cum * 5 <= total * 4 || before * 5 < total * 4)
    }
    import s.implicits._
    report.toSeq.toDF("rank", groupCol, valueCol, s"cum_$valueCol",
      "share", "cum_share", "in_top80")
  }

  val q96Oracle: String =
    """WITH ps AS (
      |  SELECT source,
      |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM ps),
      |c AS (SELECT source, tokens,
      |    CAST(ROW_NUMBER() OVER (ORDER BY tokens DESC, source ASC) AS INTEGER) AS rank,
      |    CAST(SUM(tokens) OVER (ORDER BY tokens DESC, source ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |  FROM ps)
      |SELECT c.rank, c.source, c.tokens, c.cum_tokens,
      |  ROUND(CAST(c.tokens AS DOUBLE) / CAST(t.total AS DOUBLE), 9) AS share,
      |  ROUND(CAST(c.cum_tokens AS DOUBLE) / CAST(t.total AS DOUBLE), 9) AS cum_share,
      |  c.cum_tokens * 5 <= t.total * 4
      |    OR (c.cum_tokens - c.tokens) * 5 < t.total * 4 AS in_top80
      |FROM c, t""".stripMargin

  val queries: Map[String, Q] = Map(
    "q73_skyline" -> q73Skyline,
    "q74_bfs" -> q74Bfs,
    "q75_attribution" -> q75Attribution,
    "q76_feature_scale" -> q76FeatureScale,
    "q77_target_encode" -> q77TargetEncode,
    "q78_jaro_dedup" -> q78JaroDedup,
    "q79_open_orders" -> q79OpenOrders,
    "q80_sorted_neighborhood" -> q80SortedNeighborhood,
    "q81_chi_square" -> q81ChiSquare,
    "q82_skyline_incremental" -> q82SkylineIncremental,
    "q83_ks_test" -> q83KsTest,
    "q84_group_trend" -> q84GroupTrend,
    "q85_benford" -> q85Benford,
    "q86_robust_scale" -> q86RobustScale,
    "q87_ohlc" -> q87Ohlc,
    "q88_top_paths" -> q88TopPaths,
    "q89_changepoint" -> q89Changepoint,
    "q90_interval_merge" -> q90IntervalMerge,
    "q91_gapped_pairs" -> q91GappedPairs,
    "q92_sliding_distinct" -> q92SlidingDistinct,
    "q93_weighted_median" -> q93WeightedMedian,
    "q94_column_churn" -> q94ColumnChurn,
    "q95_bootstrap_ci" -> q95BootstrapCi,
    "q96_pareto_report" -> q96ParetoReport,
    "text_bootstrap" -> textBootstrap,
    "text_url_canon" -> textUrlCanon,
    "text_fix_mojibake" -> textFixMojibake,
    "emb_label_sim" -> embLabelSim,
    "text_setsim_join" -> textSetSim,
    "text_upsample" -> textUpsample,
    "text_pmi" -> textPmi,
    "text_vocab_coverage" -> textVocabCoverage)

  val oracles: Map[String, String] = Map(
    "q73_skyline" -> q73Oracle,
    "q74_bfs" -> q74Oracle,
    "q75_attribution" -> q75Oracle,
    "q76_feature_scale" -> q76Oracle,
    "q77_target_encode" -> q77Oracle,
    "q78_jaro_dedup" -> q78Oracle,
    "q79_open_orders" -> q79Oracle,
    "q80_sorted_neighborhood" -> q80Oracle,
    "q81_chi_square" -> q81Oracle,
    "q82_skyline_incremental" -> q73Oracle, // full-table recompute IS the check
    "q83_ks_test" -> q83Oracle,
    "q84_group_trend" -> q84Oracle,
    "q85_benford" -> q85Oracle,
    "q86_robust_scale" -> q86Oracle,
    "q87_ohlc" -> q87Oracle,
    "q88_top_paths" -> q88Oracle,
    "q89_changepoint" -> q89Oracle,
    "q90_interval_merge" -> q90Oracle,
    "q91_gapped_pairs" -> q91Oracle,
    "q92_sliding_distinct" -> q92Oracle,
    "q93_weighted_median" -> q93Oracle,
    "q94_column_churn" -> q94Oracle,
    "q95_bootstrap_ci" -> q95Oracle,
    "q96_pareto_report" -> q96Oracle,
    "text_bootstrap" -> textBootstrapOracle,
    "text_url_canon" -> textUrlCanonOracle,
    // text_fix_mojibake: rows-only (strict-decoder repair has no SQL twin)
    "emb_label_sim" -> embLabelSimOracle,
    "text_setsim_join" -> textSetSimOracle,
    "text_upsample" -> textUpsampleOracle,
    "text_pmi" -> textPmiOracle,
    "text_vocab_coverage" -> textVocabCoverageOracle)
}

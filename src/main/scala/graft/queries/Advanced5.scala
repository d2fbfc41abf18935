package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RankCorr
import graft.sources.TableCatalog._

/** Round-13 additions: rank-based association (Spearman) and the
  * statistics built on the same exact-midrank machinery.
  *
  * Same oracle-parity discipline as [[Relational]]/[[Advanced]]:
  * exact integer / DECIMAL statistics everywhere, doubles only in a
  * final fixed IEEE formula shared verbatim with the DuckDB oracle,
  * deterministic tie-breaks on every top-k.
  */
object Advanced5 {

  type Q = (SparkSession, String) => DataFrame

  // ---- q137: per-nation Spearman rank correlation between customer
  //      account balance and order count — the monotone-association
  //      readout (robust where Pearson is not). Midranks with exact
  //      tie handling as DOUBLED integers (2·midrank is always
  //      integral), every sum exact DECIMAL(38,0), ρ = ONE double
  //      division rounded to 6; ranks via the tokenBudget composite
  //      rank + PrefixSum discipline, never a row-scale window. ----
  val q137Spearman: Q = (s, d) => {
    val oc = orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    val c = customer(s, d)
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_nationkey").as("nation"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    RankCorr.spearman(c, "nation", "bal_cents", "n_orders")
      .orderBy(col("nation"))
  }

  val q137Oracle: String =
    """WITH oc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1),
      |c AS (SELECT c_nationkey AS nation,
      |        CAST(round(c_acctbal * 100) AS BIGINT) AS x,
      |        CAST(COALESCE(n_orders, 0) AS BIGINT) AS y
      |      FROM customer LEFT JOIN oc ON c_custkey = o_custkey),
      |r AS (SELECT nation, x, y,
      |        2 * RANK() OVER (PARTITION BY nation ORDER BY x)
      |          + COUNT(*) OVER (PARTITION BY nation, x) - 1 AS rx,
      |        2 * RANK() OVER (PARTITION BY nation ORDER BY y)
      |          + COUNT(*) OVER (PARTITION BY nation, y) - 1 AS ry
      |      FROM c),
      |a AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
      |        SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
      |        SUM(CAST(rx AS HUGEINT) * ry) AS sxy,
      |        SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
      |        SUM(CAST(ry AS HUGEINT) * ry) AS syy
      |      FROM r GROUP BY 1)
      |SELECT nation, n,
      |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
      |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
      |  ELSE NULL END AS rho
      |FROM a ORDER BY nation""".stripMargin

  // ---- q138: per-nation robust outlier report on customer account
  //      balances — median/MAD with the 3·MAD Hampel rule, EXACT in
  //      integers end to end: median DOUBLED (lo+hi central order
  //      statistics), MAD QUADRUPLED, outlier test
  //      2·|2v − med2| > 3·mad4. No float anywhere — rows, schema
  //      and hash all engine-exact. ----
  val q138Mad: Q = (s, d) => {
    val c = customer(s, d).select(col("c_nationkey").as("nation"),
      round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    graft.operators.RobustStats.madSummary(c, "nation", "bal_cents")
      .orderBy(col("nation"))
  }

  val q138Oracle: String =
    """WITH c AS (SELECT c_nationkey AS nation,
      |             CAST(round(c_acctbal * 100) AS BIGINT) AS v
      |           FROM customer),
      |r AS (SELECT nation, v,
      |        ROW_NUMBER() OVER (PARTITION BY nation ORDER BY v) AS rn,
      |        COUNT(*) OVER (PARTITION BY nation) AS n
      |      FROM c),
      |med AS (SELECT nation, CAST(SUM(v) AS BIGINT) AS med2 FROM r
      |        WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
      |          AND (n + 1) // 2 <> (n + 2) // 2
      |        GROUP BY nation
      |        UNION ALL
      |        SELECT nation, CAST(2 * SUM(v) AS BIGINT) AS med2 FROM r
      |        WHERE rn = (n + 1) // 2 AND (n + 1) // 2 = (n + 2) // 2
      |        GROUP BY nation),
      |dev AS (SELECT c.nation, abs(2 * c.v - med.med2) AS d
      |        FROM c JOIN med ON c.nation = med.nation),
      |rd AS (SELECT nation, d,
      |         ROW_NUMBER() OVER (PARTITION BY nation ORDER BY d) AS rn,
      |         COUNT(*) OVER (PARTITION BY nation) AS n
      |       FROM dev),
      |mad AS (SELECT nation, CAST(SUM(d) AS BIGINT) AS mad4 FROM rd
      |        WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
      |          AND (n + 1) // 2 <> (n + 2) // 2
      |        GROUP BY nation
      |        UNION ALL
      |        SELECT nation, CAST(2 * SUM(d) AS BIGINT) AS mad4 FROM rd
      |        WHERE rn = (n + 1) // 2 AND (n + 1) // 2 = (n + 2) // 2
      |        GROUP BY nation)
      |SELECT dev.nation, CAST(COUNT(*) AS BIGINT) AS n, med.med2, mad.mad4,
      |  CAST(SUM(CASE WHEN 2 * dev.d > 3 * mad.mad4 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM dev JOIN med ON dev.nation = med.nation
      |         JOIN mad ON dev.nation = mad.nation
      |GROUP BY dev.nation, med.med2, mad.mad4
      |ORDER BY dev.nation""".stripMargin

  // ---- q139: autocorrelation function of daily order revenue at
  //      lags 1..7 — the seasonality/persistence diagnostic under
  //      the q116 weekday index and the q133 backtest (a weekly
  //      cycle shows as a lag-7 peak). Pearson over the (day,
  //      day+k) pair set per lag: daily revenue in exact cents, all
  //      sums exact DECIMAL(38,0) (sums of pair products — the
  //      variance-product alone is computed in doubles, the q137
  //      formula), ONE double division rounded to 6. Plan: ONE
  //      date-cardinality aggregate reused by 7 self-joins on
  //      day+k (each side day-cardinality — broadcastable at any
  //      corpus scale; dates grow with time, not data). ----
  val q139Acf: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    graft.operators.DailySeries.acf(daily, maxLag = 7)
  }

  val q139Oracle: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS rev
      |  FROM orders GROUP BY 1),
      |lags AS (SELECT unnest(range(1, 8)) AS lag),
      |pairs AS (SELECT l.lag, a.rev AS x, b.rev AS y
      |          FROM lags l JOIN daily a ON true
      |          JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)),
      |agg AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM pairs GROUP BY 1)
      |SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
      |  CASE WHEN (n_pairs * sxx - sx * sx) > 0
      |        AND (n_pairs * syy - sy * sy) > 0 THEN
      |    round(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
      |      sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
      |        * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
      |  ELSE NULL END AS acf
      |FROM agg ORDER BY lag""".stripMargin

  // ---- q140: 7-day centered ROLLING MEDIAN of daily revenue — the
  //      robust smoother next to q114's EWMA (a single spiky day
  //      moves an EWMA but not a rolling median; the q138 robustness
  //      argument applied along time). Window by DATE VALUE (±3
  //      days), not row count, so calendar gaps shrink the window
  //      honestly. Median kept DOUBLED (lo+hi order statistics) —
  //      exact integers end to end. Plan: ONE date-cardinality
  //      aggregate + a ±3-day range self-join (both sides
  //      date-cardinality — broadcastable at any corpus scale), the
  //      per-day median over ≤7 collected values. ----
  val q140RollingMedian: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    graft.operators.DailySeries.rollingMedian(daily, halfWindow = 3)
  }

  val q140Oracle: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
      |  FROM orders GROUP BY 1),
      |w AS (SELECT a.day, CAST(COUNT(*) AS BIGINT) AS n_days,
      |        list_sort(list(b.rev)) AS vs
      |      FROM daily a JOIN daily b
      |        ON b.day BETWEEN a.day - 3 AND a.day + 3
      |      GROUP BY a.day)
      |SELECT day, n_days,
      |  CAST(vs[CAST((n_days + 1) // 2 AS INTEGER)]
      |     + vs[CAST((n_days + 2) // 2 AS INTEGER)] AS BIGINT) AS med2_cents
      |FROM w ORDER BY day""".stripMargin

  // ---- emb_label_noise: k-NN label-noise detection — the
  //      training-data QA primitive (Wilson 1972 edited-nearest-
  //      neighbor family): a vector whose label disagrees with its
  //      k=5 nearest neighbors' majority is a relabel/review
  //      candidate. EXACT-integer similarity makes this the ANN
  //      family's first fully oracle-checkable member: vectors scale
  //      to round(v·10⁶) (the emb_class_scatter convention), the dot
  //      product of integer-valued doubles is exact below 2^53
  //      (64·(5.3e5·3)² ≈ 1.2e15 at this corpus), so top-5 by
  //      (sim desc, id) and the majority vote (count desc, label asc)
  //      are bit-deterministic in BOTH engines. Probes capped at
  //      vec_id < 100 (the ann_* convention); base side scans once,
  //      probes broadcast, heap top-k via TopKPerKey. ----
  val embLabelNoise: Q = (s, d) => {
    graft.plans.GraftFunctions.register(s)
    val e = embeddings(s, d).select(col("vec_id"), col("label"),
        transform(col("embedding"),
          v => round(v.cast("double") * 1000000L)).as("vi"))
      .localCheckpoint(true) // base side + probe side of one scan
    val probes = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("vi").as("qv"))
    val sims = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim",
        graft.plans.GraftFunctions.dotFast(col("vi"), col("qv")).cast("long"))
      .select(col("qid"), col("qlabel"), col("label"), col("sim"),
        col("vec_id"))
    val top = org.apache.spark.sql.graft.TopKPerKey(sims, Seq("qid"),
      Seq("sim" -> true, "vec_id" -> false), 5)
    top.groupBy(col("qid"), col("qlabel"), col("label"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("qid"), col("qlabel"))
      .agg(max(struct(col("n"), (-col("label")).cast("long").as("nl")))
        .as("best"))
      .select(col("qid").cast("bigint").as("vec_id"),
        col("qlabel").cast("int").as("label"),
        (-col("best.nl")).cast("int").as("knn_label"),
        col("best.n").cast("bigint").as("n_votes"),
        when(col("qlabel") =!= -col("best.nl"), 1).otherwise(0)
          .cast("int").as("flagged"))
      .orderBy(col("vec_id"))
  }

  val embLabelNoiseOracle: String =
    """WITH ex AS (SELECT vec_id, label, unnest(embedding) AS v,
      |              unnest(range(len(embedding))) AS pos
      |            FROM embeddings),
      |vi AS (SELECT vec_id, label, pos,
      |         CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS vi
      |       FROM ex),
      |sims AS (SELECT p.vec_id AS qid, p.label AS qlabel,
      |           b.vec_id AS bid, b.label AS blabel,
      |           SUM(p.vi * b.vi) AS sim
      |         FROM vi p JOIN vi b ON p.pos = b.pos AND b.vec_id <> p.vec_id
      |         WHERE p.vec_id < 100
      |         GROUP BY 1, 2, 3, 4),
      |top AS (SELECT qid, qlabel, blabel,
      |          ROW_NUMBER() OVER (PARTITION BY qid
      |            ORDER BY sim DESC, bid) AS rk
      |        FROM sims),
      |votes AS (SELECT qid, qlabel, blabel, COUNT(*) AS n
      |          FROM top WHERE rk <= 5 GROUP BY 1, 2, 3),
      |best AS (SELECT qid, qlabel, blabel, n,
      |           ROW_NUMBER() OVER (PARTITION BY qid
      |             ORDER BY n DESC, blabel) AS brk
      |         FROM votes)
      |SELECT CAST(qid AS BIGINT) AS vec_id, CAST(qlabel AS INTEGER) AS label,
      |  CAST(blabel AS INTEGER) AS knn_label, CAST(n AS BIGINT) AS n_votes,
      |  CAST(CASE WHEN qlabel <> blabel THEN 1 ELSE 0 END AS INTEGER)
      |    AS flagged
      |FROM best WHERE brk = 1 ORDER BY vec_id""".stripMargin

  // ---- q141: per-nation P10/P50/P90 balance bands — exact
  //      NEAREST-RANK order statistics (value at ⌈n·P/100⌉ — always
  //      an actual data value, integer arithmetic end to end, no
  //      interpolation convention to disagree on). One cumulative
  //      count table serves all three bands. ----
  val q141QuantileBands: Q = (s, d) => {
    val c = customer(s, d).select(col("c_nationkey").as("nation"),
      round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    graft.operators.RobustStats.quantilesNearestRank(
        c, "nation", "bal_cents", Seq(10, 50, 90))
      .orderBy(col("nation"))
  }

  val q141Oracle: String =
    """WITH c AS (SELECT c_nationkey AS nation,
      |             CAST(round(c_acctbal * 100) AS BIGINT) AS v
      |           FROM customer),
      |r AS (SELECT nation, v,
      |        ROW_NUMBER() OVER (PARTITION BY nation ORDER BY v) AS rn,
      |        COUNT(*) OVER (PARTITION BY nation) AS n
      |      FROM c)
      |SELECT nation, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MAX(CASE WHEN rn = greatest(1, (n * 10 + 99) // 100)
      |    THEN v END) AS BIGINT) AS p10,
      |  CAST(MAX(CASE WHEN rn = greatest(1, (n * 50 + 99) // 100)
      |    THEN v END) AS BIGINT) AS p50,
      |  CAST(MAX(CASE WHEN rn = greatest(1, (n * 90 + 99) // 100)
      |    THEN v END) AS BIGINT) AS p90
      |FROM r GROUP BY nation ORDER BY nation""".stripMargin

  // ---- q142: weekly cohort retention — the classic product-
  //      analytics matrix: cohort = a user's FIRST-event week; cell
  //      (cohort, offset) = distinct users of that cohort active
  //      offset WEEKS later, as a fraction of the cohort (weekly —
  //      the corpus spans one month; the grain knob is the only
  //      difference from the monthly classic). Offsets by integer
  //      day-difference DIV 7, spelled identically in both engines
  //      (months_between has float semantics); counts exact, retention is the ONE double
  //      division rounded 6. Plan: one first-event aggregate + one
  //      distinct (user, month) activity table + an equi-join on the
  //      user key — all shuffles on user_id, matrix is
  //      cohort×offset-cardinality. ----
  val q142CohortRetention: Q = (s, d) => {
    val ev = events(s, d)
    val first = ev.groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort"))
    val active = ev.select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("am"))
      .distinct()
    graft.operators.Cohorts.retention(first, active, maxOffset = 12)
  }

  val q142Oracle: String =
    """WITH first AS (SELECT user_id,
      |    CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
      |  FROM events GROUP BY 1),
      |active AS (SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS am
      |  FROM events),
      |sz AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
      |       FROM first GROUP BY 1),
      |cells AS (SELECT f.cohort,
      |    CAST((a.am - f.cohort) // 7 AS INTEGER) AS week_offset,
      |    CAST(COUNT(*) AS BIGINT) AS n_active
      |  FROM active a JOIN first f ON a.user_id = f.user_id
      |  WHERE (a.am - f.cohort) // 7 BETWEEN 0 AND 12
      |  GROUP BY 1, 2)
      |SELECT cells.cohort, week_offset, n_active, cohort_size,
      |  round(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6)
      |    AS retention
      |FROM cells JOIN sz ON cells.cohort = sz.cohort
      |ORDER BY cells.cohort, week_offset""".stripMargin

  // ---- q143: burstiness (Fano factor) of hourly event counts per
  //      event type — the overdispersion diagnostic (F = 1 for a
  //      Poisson arrival process; F ≫ 1 flags bursty/bot traffic,
  //      F < 1 a rate limiter). Over OBSERVED hours (absent hours
  //      are absent, stated — both engines see the same grid).
  //      F = var/mean = (n·Σc² − (Σc)²) / (n·Σc): exact bigint
  //      numerator/denominator, ONE double division rounded 9. ----
  val q143Burstiness: Q = (s, d) => {
    val hourly = events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("bigint").as("n_hours"),
        sum(col("c")).cast("bigint").as("n_events"),
        sum(col("c") * col("c")).cast("bigint").as("ss"))
      .select(col("event_type"), col("n_hours"), col("n_events"),
        round((col("n_hours") * col("ss") - col("n_events") * col("n_events"))
          .cast("double") /
          (col("n_hours") * col("n_events")).cast("double"), 9).as("fano"))
      .orderBy(col("event_type"))
  }

  val q143Oracle: String =
    """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
      |    CAST(SUM(c) AS BIGINT) AS n_events,
      |    CAST(SUM(c * c) AS BIGINT) AS ss
      |  FROM hourly GROUP BY 1)
      |SELECT event_type, n_hours, n_events,
      |  round(CAST(n_hours * ss - n_events * n_events AS DOUBLE)
      |    / CAST(n_hours * n_events AS DOUBLE), 9) AS fano
      |FROM agg ORDER BY event_type""".stripMargin

  // ---- q144 (rows-only — DuckDB has no soundex): PHONETIC blocking
  //      for entity resolution — Soundex of the last name token as
  //      the blocking key, so sound-alike spellings (Smyth/Smith,
  //      Jonsen/Johnson) land in one block where the exact-token
  //      block would never pair them; the edit-distance verifier and
  //      |block|² cap are unchanged (blocking RECALL is the only
  //      thing a blocking key changes). Census output: clusters of
  //      size ≥ 2 with their representative, deterministic. ----
  val q144SoundexBlocking: Q = (s, d) => {
    val clusters = graft.operators.EntityResolution.cluster(
      part(s, d), "p_name",
      blockKey = c => soundex(element_at(split(c, " "), -1)))
    clusters.groupBy(col("cluster"))
      .agg(count(lit(1)).cast("bigint").as("n_members"))
      .filter(col("n_members") >= 2)
      .orderBy(col("n_members").desc, col("cluster"))
      .limit(20)
  }

  // ---- q145: per-nation 10% trimmed mean of customer balances —
  //      the tail-DISCARDING robust location estimate beside q125's
  //      winsorized (tail-CLIPPING) mean. Trimmed sum = difference
  //      of two within-group cumulative value masses with exact
  //      inside-a-tie interpolation (tie order provably can't
  //      matter); integers/decimals until the ONE division. ----
  val q145TrimmedMean: Q = (s, d) => {
    val c = customer(s, d).select(col("c_nationkey").as("nation"),
      round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    graft.operators.RobustStats.trimmedMean(c, "nation", "bal_cents",
        trimBps = 1000)
      .orderBy(col("nation"))
  }

  val q145Oracle: String =
    """WITH c AS (SELECT c_nationkey AS nation,
      |             CAST(round(c_acctbal * 100) AS BIGINT) AS v
      |           FROM customer),
      |r AS (SELECT nation, v,
      |        ROW_NUMBER() OVER (PARTITION BY nation ORDER BY v) AS rn,
      |        COUNT(*) OVER (PARTITION BY nation) AS n
      |      FROM c)
      |SELECT nation, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MAX(n) - 2 * (MAX(n) * 1000 // 10000) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rn > n * 1000 // 10000
      |                 AND rn <= n - n * 1000 // 10000 THEN v END)
      |    AS BIGINT) AS trimmed_sum,
      |  round(CAST(SUM(CASE WHEN rn > n * 1000 // 10000
      |                       AND rn <= n - n * 1000 // 10000 THEN v END)
      |      AS DOUBLE)
      |    / CAST(MAX(n) - 2 * (MAX(n) * 1000 // 10000) AS DOUBLE), 6)
      |    AS trimmed_mean
      |FROM r GROUP BY nation ORDER BY nation""".stripMargin

  // ---- q146: per-nation Pearson correlation between customer
  //      balance and order count — the LINEAR-association companion
  //      to q137's Spearman on the SAME columns (divergence between
  //      the two flags outlier leverage or nonlinearity). Exact
  //      DECIMAL(38,0) moment sums, ONE double division rounded 6 —
  //      the q139 formula, grouped. ----
  val q146Pearson: Q = (s, d) => {
    val oc = orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    val c = customer(s, d)
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_nationkey").as("nation"),
        round(col("c_acctbal") * 100).cast("long").as("x"),
        coalesce(col("n_orders"), lit(0L)).as("y"))
    val agg = c.groupBy(col("nation"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("x")).cast("decimal(19,0)").as("sx"),
        sum(col("y")).cast("decimal(19,0)").as("sy"),
        sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("sxy"),
        sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("sxx"),
        sum(col("y").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("syy"))
    val n = col("n").cast("decimal(10,0)")
    val num = (n * col("sxy") - col("sx") * col("sy")).cast("decimal(38,0)")
    val varx = (n * col("sxx") - col("sx") * col("sx")).cast("decimal(38,0)")
    val vary = (n * col("syy") - col("sy") * col("sy")).cast("decimal(38,0)")
    agg.select(col("nation"), col("n"),
        when(varx > 0 && vary > 0,
          round(num.cast("double") /
            sqrt(varx.cast("double") * vary.cast("double")), 6))
          .otherwise(lit(null).cast("double")).as("r"))
      .orderBy(col("nation"))
  }

  val q146Oracle: String =
    """WITH oc AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1),
      |c AS (SELECT c_nationkey AS nation,
      |        CAST(round(c_acctbal * 100) AS BIGINT) AS x,
      |        CAST(COALESCE(n_orders, 0) AS BIGINT) AS y
      |      FROM customer LEFT JOIN oc ON c_custkey = o_custkey),
      |a AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
      |        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |        SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |        SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |        SUM(CAST(y AS HUGEINT) * y) AS syy
      |      FROM c GROUP BY 1)
      |SELECT nation, n,
      |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
      |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
      |  ELSE NULL END AS r
      |FROM a ORDER BY nation""".stripMargin

  val queries: Map[String, Q] = Map(
    "q146_pearson" -> q146Pearson,
    "q145_trimmed_mean" -> q145TrimmedMean,
    "q144_soundex_blocking" -> q144SoundexBlocking,
    "q143_burstiness" -> q143Burstiness,
    "q142_cohort_retention" -> q142CohortRetention,
    "q141_quantile_bands" -> q141QuantileBands,
    "emb_label_noise" -> embLabelNoise,
    "q137_spearman" -> q137Spearman,
    "q138_mad" -> q138Mad,
    "q139_acf" -> q139Acf,
    "q140_rolling_median" -> q140RollingMedian)

  val oracles: Map[String, String] = Map(
    "q146_pearson" -> q146Oracle,
    "q145_trimmed_mean" -> q145Oracle,
    "q143_burstiness" -> q143Oracle,
    "q142_cohort_retention" -> q142Oracle,
    "q141_quantile_bands" -> q141Oracle,
    "emb_label_noise" -> embLabelNoiseOracle,
    "q137_spearman" -> q137Oracle,
    "q138_mad" -> q138Oracle,
    "q139_acf" -> q139Oracle,
    "q140_rolling_median" -> q140Oracle)
}

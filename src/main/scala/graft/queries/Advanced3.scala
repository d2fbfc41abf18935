package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Ranking, Similarity}
import graft.sources.TableCatalog._

/** Round-12 (second wave) additions: bounded-window EWMA smoothing,
  * RFM customer segmentation, weekday seasonality indices, per-group
  * Theil–Sen robust slope, Herfindahl–Hirschman concentration, and
  * deterministic curriculum ordering — plus hard-negative mining for
  * contrastive training data (rows-only; the ANN convention).
  * SURVEY.md §2 rows 117-123.
  *
  * Oracle-parity discipline as everywhere: exact integer / DECIMAL
  * arithmetic through every aggregate; doubles only in a final fixed
  * IEEE formula spelled verbatim in the DuckDB oracle; deterministic
  * tie-breaks on every ordering.
  */
object Advanced3 {

  type Q = (SparkSession, String) => DataFrame

  private def cents(c: String): Column =
    (col(c).cast("decimal(18,2)") * 100).cast("long")

  // ---- q114: bounded-window EWMA — exponentially-weighted moving
  //      average of each user's event values over its last 20 events
  //      (decay 0.9/step). The UNBOUNDED recursive EWMA cannot be
  //      engine-portable (10^-k decay underflows and every engine
  //      associates the recursion differently); the bounded form is
  //      EXACT: weight_k = 9^k·10^(19-k) is an exact integer, the
  //      numerator Σ cents_k·w_k and denominator Σ w_k are exact
  //      DECIMAL sums over the 20-row frame, and the division is the
  //      ONE double op, rounded to 6. Window is PARTITIONED by user
  //      (bounded task state; no global sort). ----
  private val EwmaDepth = 20
  private val ewmaWeights: IndexedSeq[java.math.BigDecimal] =
    (0 until EwmaDepth).map { k =>
      new java.math.BigDecimal(
        (BigInt(9).pow(k) * BigInt(10).pow(EwmaDepth - 1 - k)).toString)
    }

  val q114Ewma: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val base = events(s, d).filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"),
        cents("value").as("c"))
    val terms = (0 until EwmaDepth).map { k =>
      val lk = if (k == 0) col("c") else lag(col("c"), k).over(w)
      val wt = lit(ewmaWeights(k))
      (when(lk.isNotNull, lk.cast("decimal(38,0)") * wt)
        .otherwise(lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")),
        when(lk.isNotNull, wt).otherwise(
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    base.select(col("user_id"), col("event_id"),
      round(num.cast("double") / den.cast("double") / lit(100), 6)
        .as("ewma"))
  }

  val q114Oracle: String = {
    val numTerms = (0 until EwmaDepth).map { k =>
      val lk = if (k == 0) "c" else s"LAG(c, $k) OVER w"
      s"COALESCE(CAST($lk AS HUGEINT) * CAST('${ewmaWeights(k)}' AS HUGEINT), 0)"
    }.mkString(" + ")
    val denTerms = (0 until EwmaDepth).map { k =>
      val lk = if (k == 0) "c" else s"LAG(c, $k) OVER w"
      s"CASE WHEN $lk IS NOT NULL THEN CAST('${ewmaWeights(k)}' AS HUGEINT) ELSE CAST(0 AS HUGEINT) END"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT user_id, event_id, ts,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
       |  FROM events WHERE value IS NOT NULL)
       |SELECT user_id, event_id,
       |  ROUND(CAST(($numTerms) AS DOUBLE) /
       |        CAST(($denTerms) AS DOUBLE) / 100, 6) AS ewma
       |FROM base
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin
  }

  // ---- q115: RFM segmentation — recency / frequency / monetary
  //      quintile scores per customer. Exact per-customer aggregates
  //      (max order date, order count, cents revenue); each quintile
  //      is the SCALABLE rank-arithmetic bucket floor((rank-1)·5/n)+1
  //      over a deterministic total order (metric, custkey) via
  //      [[Ranking.globalRank]] — NOT the single-task NTILE window
  //      (PlanAudit flags that shape; the floor split differs from
  //      SQL NTILE's larger-buckets-first tie layout, so the oracle
  //      spells the same arithmetic over ROW_NUMBER). ----
  /** Quintile scoring over a prepared `(cust, rec, freq, mon)` frame —
    * shared with [[graft.streaming.StreamRfm]], whose maintained state
    * is exactly that frame (the three metrics are mergeable partials:
    * max / sum / sum).
    */
  def rfmScores(base: DataFrame): DataFrame = {
    val n = base.agg(count(lit(1)).cast("bigint").as("n"))
    val ranked = Ranking.globalRank(
      Ranking.globalRank(
        Ranking.globalRank(base, Seq("rec", "cust"), "r_rank", 0),
        Seq("freq", "cust"), "f_rank", 0),
      Seq("mon", "cust"), "m_rank", 0)
    ranked.crossJoin(broadcast(n))
      .select(col("cust"),
        expr("(r_rank - 1) * 5 DIV n + 1").cast("bigint").as("r_score"),
        expr("(f_rank - 1) * 5 DIV n + 1").cast("bigint").as("f_score"),
        expr("(m_rank - 1) * 5 DIV n + 1").cast("bigint").as("m_score"))
      .withColumn("rfm_code",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .cast("bigint"))
  }

  /** The per-customer metric frame q115 scores (and StreamRfm folds). */
  def rfmBase(ordersDf: DataFrame): DataFrame =
    ordersDf.groupBy(col("o_custkey").as("cust"))
      .agg(max(to_date(col("o_orderdate"))).as("rec"),
        count(lit(1)).cast("bigint").as("freq"),
        sum(cents("o_totalprice")).cast("bigint").as("mon"))

  val q115Rfm: Q = (s, d) => rfmScores(rfmBase(orders(s, d)))

  val q115Oracle: String =
    """WITH base AS (
      |  SELECT o_custkey AS cust, MAX(CAST(o_orderdate AS DATE)) AS rec,
      |    CAST(COUNT(*) AS BIGINT) AS freq,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS mon
      |  FROM orders GROUP BY 1),
      |r AS (SELECT *,
      |    ROW_NUMBER() OVER (ORDER BY rec, cust) AS r_rank,
      |    ROW_NUMBER() OVER (ORDER BY freq, cust) AS f_rank,
      |    ROW_NUMBER() OVER (ORDER BY mon, cust) AS m_rank,
      |    COUNT(*) OVER () AS n
      |  FROM base)
      |SELECT cust,
      |  CAST((r_rank - 1) * 5 // n + 1 AS BIGINT) AS r_score,
      |  CAST((f_rank - 1) * 5 // n + 1 AS BIGINT) AS f_score,
      |  CAST((m_rank - 1) * 5 // n + 1 AS BIGINT) AS m_score,
      |  CAST(((r_rank - 1) * 5 // n + 1) * 100 + ((f_rank - 1) * 5 // n + 1) * 10
      |    + ((m_rank - 1) * 5 // n + 1) AS BIGINT) AS rfm_code
      |FROM r""".stripMargin

  // ---- q116: weekday seasonality index — each ISO weekday's mean
  //      event value relative to the overall mean. Exact integer
  //      sums/counts; index = (sum_d·n_all)/(n_d·sum_all) is ONE
  //      double division of exact DECIMAL products, rounded to 9.
  //      Spark's weekday() (Mon=0) == DuckDB's isodow-1. ----
  val q116Seasonal: Q = (s, d) => {
    val e = events(s, d).filter(col("value").isNotNull)
      .select(weekday(col("ts")).cast("bigint").as("dow"),
        cents("value").as("c"))
    val perDow = e.groupBy(col("dow"))
      .agg(count(lit(1)).cast("bigint").as("n_d"),
        sum(col("c")).cast("decimal(38,0)").as("sum_d"))
    val total = e.agg(count(lit(1)).cast("bigint").as("n_all"),
      sum(col("c")).cast("decimal(38,0)").as("sum_all"))
    perDow.crossJoin(broadcast(total))
      .select(col("dow"), col("n_d"),
        round((col("sum_d") * col("n_all")).cast("double") /
          (col("sum_all") * col("n_d")).cast("double"), 9)
          .as("seasonal_index"))
  }

  val q116Oracle: String =
    """WITH e AS (
      |  SELECT isodow(ts) - 1 AS dow,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events WHERE value IS NOT NULL),
      |p AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_d,
      |    CAST(SUM(c) AS HUGEINT) AS sum_d FROM e GROUP BY 1),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
      |    CAST(SUM(c) AS HUGEINT) AS sum_all FROM e)
      |SELECT CAST(dow AS BIGINT) AS dow, n_d,
      |  ROUND(CAST(sum_d * n_all AS DOUBLE) /
      |        CAST(sum_all * n_d AS DOUBLE), 9) AS seasonal_index
      |FROM p CROSS JOIN t""".stripMargin

  // ---- q117: per-nation Theil–Sen slope — the MAGNITUDE complement
  //      of q112's Mann-Kendall direction test (median of all
  //      pairwise slopes; one wild month cannot move it, unlike
  //      q84's least squares). Monthly exact-cents revenue on a
  //      LINEAR month axis (year·12+month); pair volume is months²
  //      within each nation — calendar-bounded, never corpus-bounded.
  //      Each slope is ONE double division of exact integers; the
  //      median picks by rank (ties adjacent → positional median is
  //      order-independent), averaging the two middles for even n
  //      via AVG spelled identically, rounded to 9. ----
  val q117TheilSen: Q = (s, d) => {
    val monthly = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").as("nationkey")), "o_custkey")
      .groupBy(col("nationkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("bigint").as("mi"))
      .agg(sum(cents("o_totalprice")).cast("bigint").as("rev"))
    val m = monthly.localCheckpoint(true) // pair join + month counts
    val slopes = m.as("a").join(m.as("b"),
        col("a.nationkey") === col("b.nationkey") && col("a.mi") < col("b.mi"))
      .select(col("a.nationkey").as("nationkey"),
        col("a.mi").as("mi_a"), col("b.mi").as("mi_b"),
        ((col("b.rev") - col("a.rev")).cast("double") /
          (col("b.mi") - col("a.mi")).cast("double")).as("slope"))
    val w = Window.partitionBy(col("nationkey"))
      .orderBy(col("slope"), col("mi_a"), col("mi_b"))
    val ranked = slopes.withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("np", count(lit(1))
        .over(Window.partitionBy(col("nationkey"))).cast("bigint"))
    val mid = ranked.filter(
      col("rn") === expr("(np + 1) DIV 2") || col("rn") === expr("np DIV 2 + 1"))
    val nMonths = m.groupBy(col("nationkey"))
      .agg(count(lit(1)).cast("bigint").as("n_months"))
    mid.groupBy(col("nationkey"))
      .agg(max(col("np")).as("n_pairs"),
        // round 6, not the house 9: slopes reach 7 integer digits at
        // sf1, and 16 significant digits sits at the edge of double
        // representability where the two engines' round-to-decimal
        // paths (BigDecimal half-up vs multiply-round-divide) can
        // disagree by one ulp — measured on nation 17 at sf1
        round(avg(col("slope")), 6).as("sen_slope"))
      .join(nMonths, "nationkey")
      .select(col("nationkey"), col("n_months"), col("n_pairs"),
        col("sen_slope"))
  }

  val q117Oracle: String =
    """WITH monthly AS (SELECT c.c_nationkey AS nationkey,
      |    CAST(YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate) AS BIGINT) AS mi,
      |    CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2),
      |slopes AS (SELECT a.nationkey, a.mi AS mi_a, b.mi AS mi_b,
      |    CAST(b.rev - a.rev AS DOUBLE) / CAST(b.mi - a.mi AS DOUBLE) AS slope
      |  FROM monthly a JOIN monthly b
      |    ON a.nationkey = b.nationkey AND a.mi < b.mi),
      |r AS (SELECT *,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY nationkey
      |      ORDER BY slope, mi_a, mi_b) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY nationkey) AS BIGINT) AS np
      |  FROM slopes),
      |mid AS (SELECT * FROM r
      |  WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1),
      |sen AS (SELECT nationkey, MAX(np) AS n_pairs,
      |    ROUND(AVG(slope), 6) AS sen_slope
      |  FROM mid GROUP BY 1),
      |nm AS (SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_months
      |  FROM monthly GROUP BY 1)
      |SELECT s.nationkey, n.n_months, s.n_pairs, s.sen_slope
      |FROM sen s JOIN nm n ON n.nationkey = s.nationkey""".stripMargin

  // ---- q118: Herfindahl–Hirschman concentration index — how
  //      concentrated is each nation's order revenue across its
  //      customers? HHI = Σ share_i² = Σ s_i² / (Σ s_i)², both sides
  //      exact DECIMAL(38,0) (cents² sums), ONE double division
  //      rounded to 9. 1/n_customers = perfectly even; 1.0 =
  //      single-customer. ----
  val q118Hhi: Q = (s, d) => {
    val perCust = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").as("nationkey")), "o_custkey")
      .groupBy(col("nationkey"), col("o_custkey"))
      .agg(sum(cents("o_totalprice")).cast("decimal(38,0)").as("s_i"))
    perCust.groupBy(col("nationkey"))
      .agg(count(lit(1)).cast("bigint").as("n_customers"),
        sum(col("s_i") * col("s_i")).cast("decimal(38,0)").as("sq"),
        sum(col("s_i")).cast("decimal(38,0)").as("tot"))
      .select(col("nationkey"), col("n_customers"),
        round(col("sq").cast("double") /
          (col("tot") * col("tot")).cast("double"), 9).as("hhi"))
  }

  val q118Oracle: String =
    """WITH pc AS (SELECT c.c_nationkey AS nationkey, o.o_custkey,
      |    CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS HUGEINT) AS s_i
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2)
      |SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  ROUND(CAST(SUM(s_i * s_i) AS DOUBLE) /
      |        CAST(SUM(s_i) * SUM(s_i) AS DOUBLE), 9) AS hhi
      |FROM pc GROUP BY 1""".stripMargin

  // ---- text_curriculum: deterministic curriculum ordering — length
  //      deciles (easy → hard) with an engine-portable md5 shuffle
  //      WITHIN each decile (curriculum training wants difficulty
  //      phases but no intra-phase ordering bias). Both ranks go
  //      through [[Ranking.globalRank]] (no single-task window); the
  //      per-decile sequence subtracts a decile offset computed by a
  //      10×10 self-join — model-sized, no driver walk. ----
  val textCurriculum: Q = (s, d) => {
    val u = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":cur")).cast("binary")), 1, 8), 16, 10).cast("long")
    val base = documents(s, d).select(col("doc_id"), col("n_chars"))
      .withColumn("u", u)
    val n = base.agg(count(lit(1)).cast("bigint").as("n"))
    val byLen = Ranking.globalRank(base, Seq("n_chars", "doc_id"), "len_rank", 0)
      .crossJoin(broadcast(n))
      .withColumn("bucket", expr("(len_rank - 1) * 10 DIV n + 1").cast("bigint"))
    val g = Ranking.globalRank(byLen, Seq("bucket", "u", "doc_id"), "g_rank", 0)
    val counts = g.groupBy(col("bucket"))
      .agg(count(lit(1)).cast("bigint").as("bn"))
    val offsets = counts.as("a").join(counts.as("b"),
        col("b.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("b.bn")), lit(0L)).cast("bigint").as("off"))
    g.join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("bucket"),
        (col("g_rank") - col("off")).cast("bigint").as("seq"))
  }

  val textCurriculumOracle: String =
    """WITH base AS (
      |  SELECT doc_id, n_chars,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cur'), 1, 8)) AS BIGINT) AS u,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n
      |  FROM documents),
      |b AS (SELECT *,
      |    CAST((ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1) * 10 // n + 1
      |      AS BIGINT) AS bucket
      |  FROM base)
      |SELECT doc_id, bucket,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY u, doc_id) AS BIGINT) AS seq
      |FROM b""".stripMargin

  // ---- ann_hard_negatives (rows-only; the ANN convention —
  //      float cosines): hard-negative mining for contrastive
  //      training — per query vector, the 5 nearest OUT-OF-LABEL
  //      neighbors through the broadcast-queries + TopKPerKey heap
  //      plan. Near-miss negatives carry the training signal; the
  //      label filter is what distinguishes this from ann_topk. ----
  val annHardNegatives: Q = (s, d) => {
    val e = embeddings(s, d)
    Similarity.hardNegatives(e, e.filter(col("vec_id") < 20),
      "vec_id", "embedding", "label", k = 5)
  }

  // ---- q119: functional-dependency audit — data profiling's
  //      "is this column determined by that one" check over a fixed
  //      candidate list (the schema-sized complement of q99's
  //      referential-integrity audit). An FD lhs→rhs holds iff
  //      |distinct lhs| == |distinct (lhs, rhs)|; both counts exact,
  //      violations = the difference. Cost: one distinct-aggregate
  //      pass per table — schema-bounded output, corpus-bounded scan. ----
  private def fdRow(df: DataFrame, table: String, lhs: String, rhs: String)
      : DataFrame =
    df.agg(count_distinct(col(lhs)).cast("bigint").as("n_lhs"),
        count_distinct(col(lhs), col(rhs)).cast("bigint").as("n_pairs"))
      .select(lit(table).as("tbl"), lit(s"$lhs->$rhs").as("fd"),
        col("n_lhs"), col("n_pairs"),
        (col("n_lhs") === col("n_pairs")).as("holds"),
        (col("n_pairs") - col("n_lhs")).cast("bigint").as("violations"))

  val q119FdAudit: Q = (s, d) => {
    val o = orders(s, d); val li = lineitem(s, d)
    val c = customer(s, d); val p = part(s, d)
    fdRow(o, "orders", "o_orderkey", "o_custkey")
      .unionByName(fdRow(o, "orders", "o_custkey", "o_orderpriority"))
      .unionByName(fdRow(li, "lineitem", "l_partkey", "l_suppkey"))
      .unionByName(fdRow(li, "lineitem", "l_suppkey", "l_partkey"))
      .unionByName(fdRow(c, "customer", "c_custkey", "c_nationkey"))
      .unionByName(fdRow(c, "customer", "c_nationkey", "c_mktsegment"))
      .unionByName(fdRow(p, "part", "p_partkey", "p_brand"))
      .unionByName(fdRow(p, "part", "p_brand", "p_type"))
  }

  val q119Oracle: String = {
    def one(table: String, lhs: String, rhs: String) =
      s"""SELECT '$table' AS tbl, '$lhs->$rhs' AS fd,
         |  CAST(COUNT(DISTINCT $lhs) AS BIGINT) AS n_lhs,
         |  CAST(COUNT(DISTINCT ($lhs, $rhs)) AS BIGINT) AS n_pairs,
         |  COUNT(DISTINCT $lhs) = COUNT(DISTINCT ($lhs, $rhs)) AS holds,
         |  CAST(COUNT(DISTINCT ($lhs, $rhs)) - COUNT(DISTINCT $lhs) AS BIGINT) AS violations
         |FROM $table""".stripMargin
    Seq(one("orders", "o_orderkey", "o_custkey"),
      one("orders", "o_custkey", "o_orderpriority"),
      one("lineitem", "l_partkey", "l_suppkey"),
      one("lineitem", "l_suppkey", "l_partkey"),
      one("customer", "c_custkey", "c_nationkey"),
      one("customer", "c_nationkey", "c_mktsegment"),
      one("part", "p_partkey", "p_brand"),
      one("part", "p_brand", "p_type")).mkString("\nUNION ALL\n")
  }

  // ---- q120: position-based (U-shaped) attribution — the exact-
  //      integer generalization of q75's first/last-touch: each
  //      purchase distributes 10,000 basis points over the touches
  //      in its purchase CYCLE (strictly after the previous purchase):
  //      1 touch takes all, 2 split 50/50, ≥3 give 40%/40% to
  //      first/last and split the middle 20% by integer floor with
  //      the remainder to the EARLIEST middles — deterministic
  //      integers summing to exactly 10,000 per credited purchase;
  //      touchless purchases credit 'none'. Per-user windows only
  //      (bounded state). ----
  val q120PositionAttribution: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "view", "purchase"))
      .withColumn("cycle", coalesce(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wc = Window.partitionBy(col("user_id"), col("cycle"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .withColumn("rk", row_number()
        .over(wc.orderBy(col("ts"), col("event_id"))).cast("bigint"))
      .withColumn("k", count(lit(1)).over(wc).cast("bigint"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("cycle")).localCheckpoint(true)
    val credited = touches
      .join(purchases, Seq("user_id", "cycle"), "left_semi")
      .withColumn("bp",
        when(col("k") === 1, lit(10000L))
          .when(col("k") === 2, lit(5000L))
          .when(col("rk") === 1 || col("rk") === col("k"), lit(4000L))
          .otherwise(expr("2000 DIV (k - 2)") +
            when(col("rk") - 1 <= expr("2000 % (k - 2)"), 1L).otherwise(0L))
          .cast("bigint"))
      .groupBy(col("event_type").as("touch"))
      .agg(count(lit(1)).cast("bigint").as("n_credits"),
        sum(col("bp")).cast("bigint").as("total_bp"))
    val none = purchases
      .join(touches.select(col("user_id"), col("cycle")).distinct(),
        Seq("user_id", "cycle"), "left_anti")
      .agg(count(lit(1)).cast("bigint").as("n_credits"))
      .select(lit("none").as("touch"), col("n_credits"),
        (col("n_credits") * 10000).cast("bigint").as("total_bp"))
      .filter(col("n_credits") > 0)
    credited.unionByName(none)
  }

  val q120Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cycle
      |  FROM events WHERE event_type IN ('click', 'view', 'purchase')),
      |touches AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY user_id, cycle
      |      ORDER BY ts, event_id) AS BIGINT) AS rk,
      |    CAST(COUNT(*) OVER (PARTITION BY user_id, cycle) AS BIGINT) AS k
      |  FROM ev WHERE event_type <> 'purchase'),
      |purchases AS (SELECT user_id, cycle FROM ev WHERE event_type = 'purchase'),
      |credited AS (
      |  SELECT t.event_type AS touch,
      |    CAST(CASE WHEN t.k = 1 THEN 10000
      |      WHEN t.k = 2 THEN 5000
      |      WHEN t.rk = 1 OR t.rk = t.k THEN 4000
      |      ELSE 2000 // (t.k - 2)
      |        + CASE WHEN t.rk - 1 <= 2000 % (t.k - 2) THEN 1 ELSE 0 END
      |      END AS BIGINT) AS bp
      |  FROM touches t
      |  WHERE EXISTS (SELECT 1 FROM purchases p
      |    WHERE p.user_id = t.user_id AND p.cycle = t.cycle)),
      |agg AS (
      |  SELECT touch, CAST(COUNT(*) AS BIGINT) AS n_credits,
      |    CAST(SUM(bp) AS BIGINT) AS total_bp
      |  FROM credited GROUP BY 1),
      |nones AS (
      |  SELECT 'none' AS touch, CAST(COUNT(*) AS BIGINT) AS n_credits,
      |    CAST(COUNT(*) * 10000 AS BIGINT) AS total_bp
      |  FROM purchases p
      |  WHERE NOT EXISTS (SELECT 1 FROM touches t
      |    WHERE t.user_id = p.user_id AND t.cycle = p.cycle)
      |  HAVING COUNT(*) > 0)
      |SELECT * FROM agg UNION ALL SELECT * FROM nones""".stripMargin

  // ---- graph_scc (rows-only — iterate-until-fixpoint has no
  //      recursive-CTE oracle form, the graph_kcore convention):
  //      strongly connected components of the DIRECTED purchase-
  //      sequence graph (part A → part B iff some customer's
  //      consecutive orders bought A then B — the navigation-loop /
  //      repeat-purchase cycle structure). Output is the SCC size
  //      histogram: deterministic because the coloring fixpoint is. ----
  /** The directed bulk-repurchase sequence graph shared by graph_scc
    * and graph_condensation: part A → part B iff some customer's
    * consecutive orders bought A (quantity ≥ 45) then B. The
    * high-quantity filter keeps real cycle structure — the full
    * basket graph collapses into one giant SCC on a dense corpus.
    */
  private def bulkSeqEdges(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey"), col("o_custkey"),
      col("o_orderdate"))
    val rn = row_number().over(Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))).cast("long")
    val seq = o.withColumn("rn", rn)
      .join(lineitem(s, d).filter(col("l_quantity") >= 45)
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_partkey").as("pk")).distinct(), "o_orderkey")
      .select(col("o_custkey").as("cust"), col("rn"), col("pk"))
      .localCheckpoint(true)
    seq.as("a").join(
        seq.withColumn("rn", col("rn") - 1).as("b"),
        Seq("cust", "rn"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
  }

  // partitions=8 on every scc call: the part graph is model-sized
  // (≤ |parts| nodes), so per-iteration task overhead — not data —
  // dominates the driver-looped fixpoints; the result is
  // partition-invariant (spec-pinned), only the wall clock changes
  // (the Components convention)
  val graphScc: Q = (s, d) => {
    val comp = graft.operators.GraphOps.scc(bulkSeqEdges(s, d), "src", "dst",
      partitions = 8)
    comp.groupBy(col("scc")).agg(count(lit(1)).cast("bigint").as("size"))
      .groupBy(col("size")).agg(count(lit(1)).cast("bigint").as("n_sccs"))
      .orderBy(col("size"))
  }

  // ---- q121_dbscan (rows-only — component labels have no
  //      recursive-CTE oracle form, the graph_kcore convention):
  //      deterministic DBSCAN over the q110 hash-scattered integer
  //      points (same generator, same radius) — grid-blocked
  //      neighborhoods + min-label components + canonical border
  //      assignment. Output is the one-row census: role counts,
  //      cluster count, largest cluster. ----
  val q121Dbscan: Q = (s, d) => {
    val pts = customer(s, d).select(col("c_custkey").as("id"),
      expr("(c_custkey * 2654435761L) % 100000").as("x"),
      expr("(c_custkey * 40503L + 12345) % 100000").as("y"))
      .localCheckpoint(true)
    // density-adaptive radius (deterministic in n): expected ~6
    // neighbors in a disc of radius r over the 1e5×1e5 domain —
    // a fixed r degenerates to all-noise or one-cluster as the
    // corpus density scales 10× per SF
    val n = pts.count()
    val r = math.max(1L, math.round(math.sqrt(6.0e10 / (math.Pi * n))))
    val lab = graft.operators.Dbscan
      .dbscan(pts, "id", "x", "y", r = r, minPts = 4, partitions = 8)
      .localCheckpoint(true)
    val clusters = lab.filter(col("cluster").isNotNull)
      .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).cast("bigint").as("n_clusters"),
        coalesce(max(col("sz")), lit(0L)).cast("bigint").as("max_cluster"))
    lab.agg(
        sum(when(col("role") === "core", 1L).otherwise(0L))
          .cast("bigint").as("n_core"),
        sum(when(col("role") === "border", 1L).otherwise(0L))
          .cast("bigint").as("n_border"),
        sum(when(col("role") === "noise", 1L).otherwise(0L))
          .cast("bigint").as("n_noise"))
      .crossJoin(broadcast(clusters))
  }

  // ---- q122: maximum drawdown — the finance/monitoring "worst
  //      peak-to-trough fall" of each user's running value balance.
  //      Running sum and running max over per-user windows (bounded
  //      state), everything exact integer cents; the drawdown maximum
  //      is over exact integers, bit-deterministic. ----
  val q122Drawdown: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val e = events(s, d).filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        cents("value").as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("peak", max(col("cum")).over(w))
    e.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        max(col("peak") - col("cum")).cast("bigint")
          .as("max_drawdown_cents"),
        sum(col("c")).cast("bigint").as("final_cents"),
        max(col("cum")).cast("bigint").as("peak_cents"))
  }

  val q122Oracle: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events WHERE value IS NOT NULL),
      |cu AS (
      |  SELECT user_id, ts, event_id, c, SUM(c) OVER w AS cum
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |r AS (
      |  SELECT user_id, c, cum, MAX(cum) OVER w AS peak
      |  FROM cu
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_cents,
      |  CAST(SUM(c) AS BIGINT) AS final_cents,
      |  CAST(MAX(cum) AS BIGINT) AS peak_cents
      |FROM r GROUP BY user_id""".stripMargin

  // ---- graph_condensation (rows-only): the SCC condensation of the
  //      bulk-repurchase graph layered by LONGEST-PATH topological
  //      levels — "how deep is the purchase-order dependency chain
  //      once cycles collapse". Condensed edges are distinct
  //      (scc(src), scc(dst)) pairs; isolated SCCs sit at level 0. ----
  val graphCondensation: Q = (s, d) => {
    val edges = bulkSeqEdges(s, d).localCheckpoint(true)
    val comp = graft.operators.GraphOps.scc(edges, "src", "dst",
      partitions = 8).localCheckpoint(true)
    val condensed = edges
      .join(comp.select(col("node").as("src"), col("scc").as("ca")), Seq("src"))
      .join(comp.select(col("node").as("dst"), col("scc").as("cb")), Seq("dst"))
      .filter(col("ca") =!= col("cb"))
      .select(col("ca"), col("cb")).distinct().localCheckpoint(true)
    val levels = graft.operators.GraphOps.topoLevels(condensed, "ca", "cb",
      partitions = 4)
    val isolated = comp.select(col("scc").as("node")).distinct()
      .join(levels.select("node"), Seq("node"), "left_anti")
      .withColumn("level", lit(0L))
    levels.unionByName(isolated)
      .groupBy(col("level")).agg(count(lit(1)).cast("bigint").as("n_sccs"))
      .orderBy(col("level"))
  }

  // ---- q123: join-path discovery — data-catalog profiling's "are
  //      these two columns joinable" audit: exact value-set overlap
  //      (containment + Jaccard) for a fixed candidate pair list,
  //      true FKs and a junk pair both represented. Distinct sets
  //      per side (one dedup shuffle each, value-cardinality), the
  //      intersection an equi-join of the two distinct sets; the
  //      Jaccard is ONE double division of exact bigints, rounded 9. ----
  private def overlapRow(a: DataFrame, aTbl: String, aCol: String,
                         b: DataFrame, bTbl: String, bCol: String)
      : DataFrame = {
    // r18 (profiled: 61 jobs — 2 eager checkpoints per pair × 5 pairs
    // plus three scalar aggregates each): ONE full-outer join of the
    // two distinct sets carries all three counts in a single pass —
    // n_a = left-present, n_b = right-present, n_inter = both — so
    // the whole 5-pair audit is ONE action with five independent
    // subtrees, zero checkpoints, zero intermediate collects. Exact
    // same integers: the distinct sets are unchanged, full-outer null
    // keys don't match (as the semi-join excluded them), and the
    // Jaccard is the same one division.
    val da = a.select(col(aCol).cast("long").as("v")).distinct()
      .select(col("v"), lit(1L).as("__a"))
    val db = b.select(col(bCol).cast("long").as("v")).distinct()
      .select(col("v"), lit(1L).as("__b"))
    da.join(db, Seq("v"), "full_outer")
      .agg(count(col("__a")).cast("bigint").as("n_a"),
        count(col("__b")).cast("bigint").as("n_b"),
        count(when(col("__a").isNotNull && col("__b").isNotNull, 1L))
          .cast("bigint").as("n_inter"))
      .select(lit(s"$aTbl.$aCol").as("col_a"), lit(s"$bTbl.$bCol").as("col_b"),
        col("n_a"), col("n_b"), col("n_inter"),
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 9)
          .as("jaccard"))
  }

  val q123JoinDiscovery: Q = (s, d) => {
    overlapRow(orders(s, d), "orders", "o_custkey",
        customer(s, d), "customer", "c_custkey")
      .unionByName(overlapRow(lineitem(s, d), "lineitem", "l_partkey",
        part(s, d), "part", "p_partkey"))
      .unionByName(overlapRow(lineitem(s, d), "lineitem", "l_orderkey",
        orders(s, d), "orders", "o_orderkey"))
      .unionByName(overlapRow(customer(s, d), "customer", "c_nationkey",
        supplier(s, d), "supplier", "s_nationkey"))
      .unionByName(overlapRow(part(s, d), "part", "p_size",
        lineitem(s, d), "lineitem", "l_linenumber"))
  }

  val q123Oracle: String = {
    def one(aTbl: String, aCol: String, bTbl: String, bCol: String) =
      s"""SELECT '$aTbl.$aCol' AS col_a, '$bTbl.$bCol' AS col_b,
         |  (SELECT CAST(COUNT(DISTINCT $aCol) AS BIGINT) FROM $aTbl) AS n_a,
         |  (SELECT CAST(COUNT(DISTINCT $bCol) AS BIGINT) FROM $bTbl) AS n_b,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM
         |     (SELECT DISTINCT $aCol FROM $aTbl) x
         |     WHERE EXISTS (SELECT 1 FROM $bTbl WHERE $bCol = x.$aCol)) AS n_inter,
         |  ROUND(
         |    CAST((SELECT COUNT(*) FROM (SELECT DISTINCT $aCol FROM $aTbl) x
         |      WHERE EXISTS (SELECT 1 FROM $bTbl WHERE $bCol = x.$aCol)) AS DOUBLE) /
         |    CAST((SELECT COUNT(DISTINCT $aCol) FROM $aTbl)
         |      + (SELECT COUNT(DISTINCT $bCol) FROM $bTbl)
         |      - (SELECT COUNT(*) FROM (SELECT DISTINCT $aCol FROM $aTbl) x
         |         WHERE EXISTS (SELECT 1 FROM $bTbl WHERE $bCol = x.$aCol)) AS DOUBLE),
         |    9) AS jaccard""".stripMargin
    Seq(one("orders", "o_custkey", "customer", "c_custkey"),
      one("lineitem", "l_partkey", "part", "p_partkey"),
      one("lineitem", "l_orderkey", "orders", "o_orderkey"),
      one("customer", "c_nationkey", "supplier", "s_nationkey"),
      one("part", "p_size", "lineitem", "l_linenumber"))
      .mkString("\nUNION ALL\n")
  }

  val queries: Map[String, Q] = Map(
    "q114_ewma" -> q114Ewma,
    "q115_rfm" -> q115Rfm,
    "q116_seasonal" -> q116Seasonal,
    "q117_theilsen" -> q117TheilSen,
    "q118_hhi" -> q118Hhi,
    "text_curriculum" -> textCurriculum,
    "ann_hard_negatives" -> annHardNegatives,
    "q119_fd_audit" -> q119FdAudit,
    "q120_position_attribution" -> q120PositionAttribution,
    "graph_scc" -> graphScc,
    "q121_dbscan" -> q121Dbscan,
    "q122_drawdown" -> q122Drawdown,
    "graph_condensation" -> graphCondensation,
    "q123_join_discovery" -> q123JoinDiscovery)

  val oracles: Map[String, String] = Map(
    "q114_ewma" -> q114Oracle,
    "q115_rfm" -> q115Oracle,
    "q116_seasonal" -> q116Oracle,
    "q117_theilsen" -> q117Oracle,
    "q118_hhi" -> q118Oracle,
    "text_curriculum" -> textCurriculumOracle,
    "q119_fd_audit" -> q119Oracle,
    "q120_position_attribution" -> q120Oracle,
    "q122_drawdown" -> q122Oracle,
    "q123_join_discovery" -> q123Oracle)
}

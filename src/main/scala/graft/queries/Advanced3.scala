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
  val q115Rfm: Q = (s, d) => {
    val base = orders(s, d).groupBy(col("o_custkey").as("cust"))
      .agg(max(to_date(col("o_orderdate"))).as("rec"),
        count(lit(1)).cast("bigint").as("freq"),
        sum(cents("o_totalprice")).cast("bigint").as("mon"))
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
        round(avg(col("slope")), 9).as("sen_slope"))
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
      |    ROUND(AVG(slope), 9) AS sen_slope
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

  val queries: Map[String, Q] = Map(
    "q114_ewma" -> q114Ewma,
    "q115_rfm" -> q115Rfm,
    "q116_seasonal" -> q116Seasonal,
    "q117_theilsen" -> q117TheilSen,
    "q118_hhi" -> q118Hhi,
    "text_curriculum" -> textCurriculum,
    "ann_hard_negatives" -> annHardNegatives)

  val oracles: Map[String, String] = Map(
    "q114_ewma" -> q114Oracle,
    "q115_rfm" -> q115Oracle,
    "q116_seasonal" -> q116Oracle,
    "q117_theilsen" -> q117Oracle,
    "q118_hhi" -> q118Oracle,
    "text_curriculum" -> textCurriculumOracle)
}

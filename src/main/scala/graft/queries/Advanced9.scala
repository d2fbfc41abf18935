package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Logit, PoissonReg, StatTests}

/** Round-17 additions beyond the verdict list: the post-hoc contrast
  * layer (pairwise Welch under BH-FDR), the ordered-proportion trend
  * test (Cochran–Armitage), and grouped logistic regression on the
  * driver-Newton cell architecture.
  *
  * Same oracle-parity discipline as [[Advanced8]]: exact integer /
  * DECIMAL sufficient statistics, doubles only in fixed IEEE
  * formulas shared verbatim with the DuckDB oracle.
  */
object Advanced9 {

  type Q = (SparkSession, String) => DataFrame

  import graft.sources.TableCatalog._

  // ---- q183: post-hoc pairwise Welch under BH-FDR — "WHICH segment
  //      pairs differ in order value?" per year, after q156/q176's
  //      omnibus tests say "not all equal": every unordered segment
  //      pair Welch-tested on exact moments, all 70 contrasts
  //      jointly BH-adjusted (the q160 machinery) so the reported
  //      rejections control the false discovery rate across the
  //      whole table. ----
  val q183Posthoc: Q = (s, d) => {
    val os = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), Seq("o_custkey"))
      .select(year(col("o_orderdate")).as("yr"), col("seg"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    StatTests.posthocPairwiseWelch(os, "yr", "seg", "cents")
  }

  val q183Oracle: String = {
    val pExpr = StatTests.normalTwoSidedPSql("t")
    s"""WITH os AS (SELECT EXTRACT(year FROM o_orderdate) AS g,
      |        c_mktsegment AS smp,
      |        CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |      FROM orders JOIN customer ON c_custkey = o_custkey),
      |m AS (SELECT g, smp, CAST(COUNT(*) AS BIGINT) AS n,
      |        CAST(SUM(v) AS HUGEINT) AS s,
      |        CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
      |      FROM os GROUP BY 1, 2),
      |pairs AS (SELECT a.g, a.smp AS s_a, b.smp AS s_b,
      |        a.n AS na, b.n AS nb, a.s AS sa, b.s AS sb,
      |        a.q AS qa, b.q AS qb
      |      FROM m a JOIN m b ON a.g = b.g AND a.smp < b.smp
      |      WHERE a.n > 1 AND b.n > 1),
      |e AS (SELECT g, s_a, s_b, na, nb,
      |        CAST(sa AS DOUBLE) / na AS mean_a,
      |        CAST(sb AS DOUBLE) / nb AS mean_b,
      |        (CAST(na * qa - sa * sa AS DOUBLE) /
      |          CAST(na * (na - 1) AS DOUBLE)) / na AS vna,
      |        (CAST(nb * qb - sb * sb AS DOUBLE) /
      |          CAST(nb * (nb - 1) AS DOUBLE)) / nb AS vnb
      |      FROM pairs),
      |tested AS (SELECT g, s_a, s_b, na AS n_a, nb AS n_b,
      |        CASE WHEN vna + vnb > 0 THEN
      |          round((mean_a - mean_b) / sqrt(vna + vnb), 6)
      |        ELSE NULL END AS t
      |      FROM e),
      |pt AS (SELECT g, s_a, s_b, n_a, n_b, t,
      |        round($pExpr, 9) AS p,
      |        CAST(g AS VARCHAR) || '|' || s_a || '|' || s_b AS contrast
      |      FROM tested WHERE t IS NOT NULL),
      |ranked AS (SELECT *,
      |        CAST(ROW_NUMBER() OVER (ORDER BY p, contrast) AS BIGINT)
      |          AS i,
      |        CAST(COUNT(*) OVER () AS BIGINT) AS m
      |      FROM pt),
      |adj AS (SELECT a.contrast, a.g, a.s_a, a.s_b, a.n_a, a.n_b,
      |        a.t, a.p, a.i, a.m,
      |        round(MIN(least(1.0, CAST(b.m AS DOUBLE) * b.p
      |          / CAST(b.i AS DOUBLE))), 6) AS p_adj
      |      FROM ranked a JOIN ranked b ON b.i >= a.i
      |      GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
      |SELECT contrast, g AS yr, s_a, s_b, n_a, n_b, t, p, i, m,
      |  p_adj, p_adj <= 0.05 AS reject
      |FROM adj ORDER BY i""".stripMargin
  }

  // ---- q185: Cochran–Armitage trend — "does the probability a line
  //      item is RETURNED rise with its discount level?" per ship
  //      year: the ordered-proportion member of the trend family
  //      (q165 JT orders continuous responses; this orders a binary
  //      rate along the 0–10% discount ladder). All five sufficient
  //      integers exact; z one shared-text formula. ----
  val q185CochranArmitage: Q = (s, d) => {
    val li = lineitem(s, d)
      .select(year(col("l_shipdate")).as("yr"),
        round(col("l_discount") * 100).cast("long").as("disc"),
        (col("l_returnflag") === "R").as("ret"))
    StatTests.cochranArmitage(li, "yr", "disc", "ret")
      .orderBy(col("yr"))
  }

  val q185Oracle: String =
    s"""WITH li AS (SELECT EXTRACT(year FROM l_shipdate) AS yr,
      |        CAST(round(l_discount * 100) AS BIGINT) AS w,
      |        CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS yy
      |      FROM lineitem),
      |agg AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n,
      |        CAST(COUNT(DISTINCT w) AS BIGINT) AS k,
      |        CAST(SUM(yy) AS BIGINT) AS y,
      |        CAST(SUM(CAST(w AS HUGEINT) * yy) AS BIGINT) AS t,
      |        CAST(SUM(CAST(w AS HUGEINT)) AS BIGINT) AS wn,
      |        CAST(SUM(CAST(w AS HUGEINT) * w) AS BIGINT) AS wwn
      |      FROM li GROUP BY 1)
      |SELECT yr, k, n, y, t, wn, wwn,
      |  CASE WHEN y > 0 AND y < n AND ${StatTests.caVarTermSql} > 0
      |    THEN round(${StatTests.caZFormulaSql}, 6) ELSE NULL END AS z
      |FROM agg ORDER BY yr""".stripMargin

  // ---- q184: grouped LOGISTIC REGRESSION — P(returned) ~ discount
  //      + quantity per ship year: the binary-outcome GLM on the
  //      coxPh driver-Newton cell architecture (bounded 11×50 cells
  //      per year, one distributed aggregation, bit-deterministic
  //      fixed-iteration IRLS). Rows-only (transcendental
  //      likelihood); the closed-form identities live in LogitSpec. ----
  val q184Logit: Q = (s, d) => {
    val li = lineitem(s, d)
      .select(year(col("l_shipdate")).as("yr"),
        (col("l_returnflag") === "R").as("ret"),
        round(col("l_discount") * 100).cast("long").as("disc"),
        col("l_quantity").cast("long").as("qty"))
    Logit.fitGrouped(li, "yr", Seq("disc", "qty"), "ret")
      .orderBy(col("yr"), col("term"))
  }

  // ---- q186: grouped POISSON REGRESSION — order frequency ~
  //      account balance (k$) + BUILDING-segment membership per
  //      region: the count-outcome GLM on the same driver-Newton
  //      cell architecture (bounded ~24 cells per region). Customers
  //      with no orders count as zero (the left join — dropping them
  //      would bias every rate up). Rows-only; the closed-form
  //      rate-ratio identities live in Round17PosthocSpec. ----
  val q186Poisson: Q = (s, d) => {
    val cnt = orders(s, d).groupBy(col("o_custkey").as("ck"))
      .agg(count(lit(1)).cast("long").as("n_orders"))
    val c = customer(s, d)
      .join(nation(s, d).select(col("n_nationkey").as("c_nationkey"),
        col("n_regionkey").as("region")), Seq("c_nationkey"))
      .select(col("region"), col("c_custkey").as("ck"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_k"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("bld"))
      .join(cnt, Seq("ck"), "left")
      .na.fill(0L, Seq("n_orders"))
    PoissonReg.fitGrouped(c, "region", Seq("bal_k", "bld"), "n_orders")
      .orderBy(col("region"), col("term"))
  }

  val queries: Map[String, Q] = Map(
    "q183_posthoc_welch" -> q183Posthoc,
    "q184_logit" -> q184Logit,
    "q185_cochran_armitage" -> q185CochranArmitage,
    "q186_poisson" -> q186Poisson)

  val oracles: Map[String, String] = Map(
    "q183_posthoc_welch" -> q183Oracle,
    "q185_cochran_armitage" -> q185Oracle)
}

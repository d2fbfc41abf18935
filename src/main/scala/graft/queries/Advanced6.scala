package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, RankCorr}
import graft.sources.TableCatalog._

/** Round-14 additions: the paired rank test (Wilcoxon), tie-corrected
  * pair concordance (Kendall τ-b), structural link prediction,
  * survival analysis (Kaplan–Meier + log-rank), isotonic calibration,
  * difference-in-differences, and personalized PageRank.
  *
  * Same oracle-parity discipline as [[Advanced5]]: exact integer /
  * DECIMAL statistics everywhere, doubles only in a final fixed IEEE
  * formula shared verbatim with the DuckDB oracle, deterministic
  * tie-breaks on every top-k.
  */
object Advanced6 {

  type Q = (SparkSession, String) => DataFrame

  // ---- q148: per-nation Wilcoxon signed-rank test of 1995-vs-1996
  //      customer spend — the PAIRED non-parametric location test
  //      next to q91's unpaired Welch: each customer with orders in
  //      both years is one pair, d = cents95 − cents96, zero diffs
  //      dropped per the standard definition. Doubled midranks of |d|
  //      (the q137 machinery), 2·W+ exact DECIMAL, tie-corrected
  //      variance exact via 48·var = 2n(n+1)(2n+1) − Σ(t³−t); z the
  //      ONE double formula rounded to 6. ----
  val q148Wilcoxon: Q = (s, d) => {
    val o = orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1995, 1996))
      .groupBy(col("o_custkey"), col("yr"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val pairs = o.filter(col("yr") === 1995)
      .select(col("o_custkey").as("ck"), col("cents").as("a"))
      .join(o.filter(col("yr") === 1996)
        .select(col("o_custkey").as("ck"), col("cents").as("b")), Seq("ck"))
      .join(customer(s, d).select(col("c_custkey").as("ck"),
        col("c_nationkey").as("nation")), Seq("ck"))
      .select(col("nation"), (col("a") - col("b")).as("diff"))
    RankCorr.wilcoxonSignedRank(pairs, "nation", "diff")
      .orderBy(col("nation"))
  }

  /** The un-ordered q148 body, shared with q160's oracle (which
    * wraps it in a CTE where a trailing ORDER BY would be invalid) —
    * one definition, no string surgery at the composition site.
    */
  private[queries] val q148OracleBody: String =
    """WITH o AS (SELECT o_custkey, EXTRACT(year FROM o_orderdate) AS yr,
      |        SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      |      FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
      |      GROUP BY 1, 2),
      |p AS (SELECT c_nationkey AS nation, a.cents - b.cents AS d
      |      FROM o a JOIN o b ON a.o_custkey = b.o_custkey
      |        AND a.yr = 1995 AND b.yr = 1996
      |      JOIN customer ON c_custkey = a.o_custkey),
      |cells AS (SELECT nation, abs(d) AS ad,
      |        CAST(COUNT(*) AS BIGINT) AS cnt,
      |        CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos
      |      FROM p WHERE d <> 0 GROUP BY 1, 2),
      |r AS (SELECT nation, cnt, pos,
      |        2 * (SUM(cnt) OVER (PARTITION BY nation ORDER BY ad
      |               ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS m2
      |      FROM cells),
      |a AS (SELECT nation, CAST(SUM(cnt) AS BIGINT) AS n,
      |        SUM(CAST(pos AS HUGEINT) * m2) AS w2,
      |        SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS t3t
      |      FROM r GROUP BY 1)
      |SELECT nation, n, CAST(w2 AS BIGINT) AS w2_plus,
      |  round(CAST(2 * w2 - CAST(n AS HUGEINT) * (n + 1) AS DOUBLE) /
      |    (4.0 * sqrt(CAST(2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1)
      |      - t3t AS DOUBLE) / 48.0)), 6) AS z
      |FROM a""".stripMargin

  val q148Oracle: String = q148OracleBody + "\nORDER BY nation"

  // ---- q149: Kendall τ-b between quantity and discount cents per
  //      return flag — pair concordance under HEAVY ties (50 × 11
  //      distinct values), which is exactly where τ-b's tie
  //      correction matters and Spearman's midranks blur. Pair
  //      algebra on the per-(mode, qty, disc) JOINT count table: the
  //      cell self-join is cardinality², never rows² — 550² cells
  //      per group at ANY corpus scale. S = 2(C−D) exact DECIMAL;
  //      τ-b the ONE double division rounded to 6. ----
  val q149Kendall: Q = (s, d) => {
    val li = lineitem(s, d).select(col("l_returnflag").as("mode"),
      col("l_quantity").cast("long").as("qty"),
      round(col("l_discount") * 100).cast("long").as("disc"))
    RankCorr.kendallTauB(li, "mode", "qty", "disc")
      .orderBy(col("mode"))
  }

  val q149Oracle: String =
    """WITH li AS (SELECT l_returnflag AS mode,
      |        CAST(l_quantity AS BIGINT) AS x,
      |        CAST(round(l_discount * 100) AS BIGINT) AS y
      |      FROM lineitem),
      |cells AS (SELECT mode, x, y, CAST(COUNT(*) AS BIGINT) AS cnt
      |      FROM li GROUP BY 1, 2, 3),
      |s AS (SELECT a.mode,
      |        SUM(CAST(a.cnt AS HUGEINT) * b.cnt *
      |          sign(a.x - b.x) * sign(a.y - b.y)) AS s
      |      FROM cells a JOIN cells b ON a.mode = b.mode
      |        AND (a.x <> b.x OR a.y <> b.y)
      |      GROUP BY 1),
      |tx AS (SELECT mode, SUM(CAST(t AS HUGEINT) * (t - 1)) AS tx FROM
      |        (SELECT mode, x, SUM(cnt) AS t FROM cells GROUP BY 1, 2)
      |      GROUP BY 1),
      |ty AS (SELECT mode, SUM(CAST(t AS HUGEINT) * (t - 1)) AS ty FROM
      |        (SELECT mode, y, SUM(cnt) AS t FROM cells GROUP BY 1, 2)
      |      GROUP BY 1),
      |n AS (SELECT mode, CAST(SUM(cnt) AS BIGINT) AS n FROM cells GROUP BY 1)
      |SELECT mode, n, CAST(COALESCE(s, 0) AS BIGINT) AS s,
      |  CASE WHEN CAST(n AS HUGEINT) * (n - 1) - tx > 0
      |        AND CAST(n AS HUGEINT) * (n - 1) - ty > 0 THEN
      |    round(CAST(COALESCE(s, 0) AS DOUBLE) /
      |      sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - tx AS DOUBLE)
      |        * CAST(CAST(n AS HUGEINT) * (n - 1) - ty AS DOUBLE)), 6)
      |  ELSE NULL END AS tau_b
      |FROM n LEFT JOIN s USING (mode) JOIN tx USING (mode) JOIN ty USING (mode)
      |ORDER BY mode""".stripMargin

  // ---- q150: link prediction on the co-purchase graph — top-20
  //      NON-adjacent part pairs by common-neighbor count with the
  //      exact-integer Jaccard ppm tiebreak (no ln — the q85/PMI
  //      no-float ranking rule; Adamic–Adar would hang the hash on
  //      ulps). Wedges counted once at their center, anti-join
  //      removes existing edges, TakeOrdered top-k. ----
  val q150LinkPrediction: Q = (s, d) => {
    val li = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("x"), col("b.pk").as("y"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("x"), col("y"))
    GraphOps.commonNeighborLinks(edges, "x", "y", k = 20)
  }

  val q150Oracle: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e AS (SELECT a.pk AS x, b2.pk AS y FROM b a JOIN b b2
      |        ON a.ok = b2.ok AND a.pk < b2.pk
      |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |sym AS (SELECT x, y FROM e UNION ALL SELECT y, x FROM e),
      |deg AS (SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS deg
      |      FROM sym GROUP BY 1),
      |cn AS (SELECT s1.y AS x, s2.y AS y, CAST(COUNT(*) AS BIGINT) AS common
      |      FROM sym s1 JOIN sym s2 ON s1.x = s2.x AND s1.y < s2.y
      |      GROUP BY 1, 2),
      |cand AS (SELECT cn.* FROM cn ANTI JOIN e USING (x, y))
      |SELECT x, y, common,
      |  CAST(common * 1000000 // (dx.deg + dy.deg - common) AS BIGINT)
      |    AS jaccard_ppm,
      |  dx.deg AS deg_x, dy.deg AS deg_y
      |FROM cand JOIN deg dx ON cand.x = dx.node
      |JOIN deg dy ON cand.y = dy.node
      |ORDER BY common DESC, jaccard_ppm DESC, x, y LIMIT 20""".stripMargin

  /** Per-customer reorder gaps with right censoring at the corpus
    * end — the classic churn observation set: every consecutive
    * order pair is an observed "reordered after t days" event; the
    * window from the last order to the corpus end is a CENSORED
    * observation ("no reorder for at least t days"). Shared by q151
    * (Kaplan–Meier) and q152 (log-rank).
    */
  private[queries] def reorderGaps(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = orders(s, d).select(col("o_custkey").as("ck"),
      col("o_orderdate").as("dt"))
    val endD = o.agg(max(col("dt")).as("endd"))
    val w = Window.partitionBy(col("ck")).orderBy(col("dt"))
    o.withColumn("nxt", lead(col("dt"), 1).over(w))
      .crossJoin(broadcast(endD))
      .join(customer(s, d).select(col("c_custkey").as("ck"),
        col("c_mktsegment").as("seg")), Seq("ck"))
      .select(col("seg"),
        when(col("nxt").isNotNull, datediff(col("nxt"), col("dt")))
          .otherwise(datediff(col("endd"), col("dt")))
          .cast("long").as("t"),
        when(col("nxt").isNotNull, 1).otherwise(0).as("e"))
  }

  private[queries] val gapsSql: String =
    """o AS (SELECT o_custkey AS ck, o_orderdate AS dt FROM orders),
      |mx AS (SELECT MAX(dt) AS endd FROM o),
      |g AS (SELECT ck, dt,
      |        LEAD(dt) OVER (PARTITION BY ck ORDER BY dt) AS nxt FROM o),
      |obs AS (SELECT c_mktsegment AS seg,
      |        CAST(CASE WHEN nxt IS NOT NULL THEN date_diff('day', dt, nxt)
      |             ELSE date_diff('day', dt, endd) END AS BIGINT) AS t,
      |        CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS e
      |      FROM g, mx JOIN customer ON c_custkey = ck)""".stripMargin

  // ---- q151: Kaplan–Meier reorder-gap survival per market segment —
  //      time-to-event under RIGHT CENSORING (the family no moment or
  //      rank statistic covers: a censored gap says "no reorder for
  //      AT LEAST t days"; dropping it biases churn estimates). Risk
  //      sets n(t) = N − #{time < t} exact integers off the shared
  //      cumulative-count machinery; the product Π(1 − d/n) is the
  //      ONE sequential double fold, driver-side in ascending (seg,
  //      t) — the same multiply order as the oracle's windowed
  //      product() — rounded 9. ----
  val q151KaplanMeier: Q = (s, d) =>
    graft.operators.Survival.kaplanMeier(reorderGaps(s, d), "seg", "t", "e")
      .orderBy(col("seg"), col("t"))

  val q151Oracle: String =
    s"""WITH $gapsSql,
      |counts AS (SELECT seg, t, CAST(SUM(e) AS BIGINT) AS d,
      |        CAST(COUNT(*) AS BIGINT) AS cnt FROM obs GROUP BY 1, 2),
      |ng AS (SELECT seg, SUM(cnt) AS n_g FROM counts GROUP BY 1),
      |below AS (SELECT seg, t, d,
      |        SUM(cnt) OVER (PARTITION BY seg ORDER BY t
      |          ROWS UNBOUNDED PRECEDING) - cnt AS below
      |      FROM counts),
      |steps AS (SELECT seg, t, CAST(n_g - below AS BIGINT) AS n_risk, d
      |      FROM below JOIN ng USING (seg) WHERE d > 0)
      |SELECT seg, t, n_risk, d,
      |  round(product(1.0 - CAST(d AS DOUBLE) / n_risk)
      |    OVER (PARTITION BY seg ORDER BY t ROWS UNBOUNDED PRECEDING), 9)
      |    AS survival
      |FROM steps ORDER BY seg, t""".stripMargin

  // ---- q152: two-sample LOG-RANK test, BUILDING vs MACHINERY
  //      reorder-gap survival — "do these segments churn at the same
  //      rate?" with censoring handled correctly. Fully distributed
  //      deterministic algebra: per pooled event time, E and V are
  //      single exact integral divisions FLOORED AT PPM
  //      (DECIMAL(38,0) products, DIV == the oracle's HUGEINT //),
  //      so the sums are order-free exact integers; z is the ONE
  //      double formula rounded 6. ----
  val q152LogRank: Q = (s, d) =>
    graft.operators.Survival.logRank(
      reorderGaps(s, d).filter(col("seg").isin("BUILDING", "MACHINERY")),
      "seg", "t", "e", groupA = "BUILDING")

  val q152Oracle: String =
    s"""WITH $gapsSql,
      |obs2 AS (SELECT * FROM obs WHERE seg IN ('BUILDING', 'MACHINERY')),
      |counts AS (SELECT seg, t, CAST(SUM(e) AS BIGINT) AS d,
      |        CAST(COUNT(*) AS BIGINT) AS cnt FROM obs2 GROUP BY 1, 2),
      |axis AS (SELECT DISTINCT t FROM counts),
      |segs AS (SELECT DISTINCT seg FROM counts),
      |filled AS (SELECT seg, t, COALESCE(d, 0) AS d, COALESCE(cnt, 0) AS cnt
      |      FROM (SELECT * FROM axis CROSS JOIN segs)
      |      LEFT JOIN counts USING (seg, t)),
      |ng AS (SELECT seg, SUM(cnt) AS n_g FROM filled GROUP BY 1),
      |below AS (SELECT seg, t, d,
      |        SUM(cnt) OVER (PARTITION BY seg ORDER BY t
      |          ROWS UNBOUNDED PRECEDING) - cnt AS below
      |      FROM filled),
      |pg AS (SELECT seg, t, d, CAST(n_g - below AS BIGINT) AS n_risk
      |      FROM below JOIN ng USING (seg)),
      |bt AS (SELECT t,
      |        SUM(CASE WHEN seg = 'BUILDING' THEN d ELSE 0 END) AS d_a,
      |        SUM(CASE WHEN seg <> 'BUILDING' THEN d ELSE 0 END) AS d_b,
      |        SUM(CASE WHEN seg = 'BUILDING' THEN n_risk ELSE 0 END) AS n_a,
      |        SUM(CASE WHEN seg <> 'BUILDING' THEN n_risk ELSE 0 END) AS n_b
      |      FROM pg GROUP BY 1 HAVING SUM(d) > 0),
      |terms AS (SELECT d_a,
      |        CAST(n_a AS HUGEINT) * (d_a + d_b) * 1000000
      |          // CAST(n_a + n_b AS HUGEINT) AS e_ppm,
      |        CASE WHEN n_a + n_b > 1 THEN
      |          CAST(d_a + d_b AS HUGEINT) * n_a * n_b
      |            * (n_a + n_b - d_a - d_b) * 1000000
      |            // (CAST(n_a + n_b AS HUGEINT) * (n_a + n_b)
      |              * (n_a + n_b - 1))
      |        ELSE 0 END AS v_ppm
      |      FROM bt),
      |agg AS (SELECT CAST(SUM(d_a) AS BIGINT) AS o_a,
      |        CAST(SUM(e_ppm) AS BIGINT) AS e_a_ppm,
      |        CAST(SUM(v_ppm) AS BIGINT) AS var_a_ppm FROM terms)
      |SELECT o_a, e_a_ppm, var_a_ppm,
      |  CASE WHEN var_a_ppm > 0 THEN
      |    round((CAST(o_a AS DOUBLE) - CAST(e_a_ppm AS DOUBLE) / 1000000.0)
      |      / sqrt(CAST(var_a_ppm AS DOUBLE) / 1000000.0), 6)
      |  ELSE NULL END AS z
      |FROM agg""".stripMargin

  // ---- q153 (rows-only — PAV pooling is inherently sequential, no
  //      SQL form): isotonic calibration of P(return | quantity) —
  //      the monotone step-function fit that turns a ranking score
  //      into calibrated probabilities, blocks chosen by the data
  //      (vs q104's fixed bins). Exact: per-score count table, PAV
  //      violator comparisons as BigInt cross-multiplications, ONE
  //      rate division per block rounded 9. ----
  val q153Isotonic: Q = (s, d) => {
    val li = lineitem(s, d).select(
      col("l_quantity").cast("long").as("qty"),
      when(col("l_returnflag") === "R", 1).otherwise(0).as("ret"))
    graft.operators.Isotonic.calibrate(li, "qty", "ret")
      .orderBy(col("score_lo"))
  }

  // ---- q154: difference-in-differences — the canonical
  //      quasi-experimental estimator next to q91 Welch / q103 CUPED
  //      (those need randomized assignment; DiD differences OUT both
  //      the fixed group gap and the common time trend): treated =
  //      BUILDING-segment orders, pre/post = 1995/1996, outcome =
  //      order value. All four cells as EXACT (n, cents-sum) pairs;
  //      the estimate is the ONE double formula of the four exact
  //      means, in dollars rounded 4. ----
  val q154Did: Q = (s, d) => {
    val o = orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1995, 1996))
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), Seq("o_custkey"))
      .select((col("seg") === "BUILDING").cast("int").as("tr"),
        (col("yr") === 1996).cast("int").as("po"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val a = o.agg(
      sum(when(col("tr") === 1 && col("po") === 0, 1L).otherwise(0L))
        .cast("bigint").as("n_t_pre"),
      sum(when(col("tr") === 1 && col("po") === 0, col("cents"))
        .otherwise(0L)).cast("bigint").as("cents_t_pre"),
      sum(when(col("tr") === 1 && col("po") === 1, 1L).otherwise(0L))
        .cast("bigint").as("n_t_post"),
      sum(when(col("tr") === 1 && col("po") === 1, col("cents"))
        .otherwise(0L)).cast("bigint").as("cents_t_post"),
      sum(when(col("tr") === 0 && col("po") === 0, 1L).otherwise(0L))
        .cast("bigint").as("n_c_pre"),
      sum(when(col("tr") === 0 && col("po") === 0, col("cents"))
        .otherwise(0L)).cast("bigint").as("cents_c_pre"),
      sum(when(col("tr") === 0 && col("po") === 1, 1L).otherwise(0L))
        .cast("bigint").as("n_c_post"),
      sum(when(col("tr") === 0 && col("po") === 1, col("cents"))
        .otherwise(0L)).cast("bigint").as("cents_c_post"))
    a.withColumn("did_dollars",
      round(((col("cents_t_post").cast("double") / col("n_t_post").cast("double")
        - col("cents_t_pre").cast("double") / col("n_t_pre").cast("double"))
        - (col("cents_c_post").cast("double") / col("n_c_post").cast("double")
          - col("cents_c_pre").cast("double") / col("n_c_pre").cast("double")))
        / lit(100.0), 4))
  }

  val q154Oracle: String =
    """WITH o AS (SELECT
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS tr,
      |    CASE WHEN EXTRACT(year FROM o_orderdate) = 1996 THEN 1 ELSE 0 END AS po,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON c_custkey = o_custkey
      |  WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)),
      |a AS (SELECT
      |  CAST(SUM(CASE WHEN tr = 1 AND po = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
      |  CAST(SUM(CASE WHEN tr = 1 AND po = 0 THEN cents ELSE 0 END) AS BIGINT) AS cents_t_pre,
      |  CAST(SUM(CASE WHEN tr = 1 AND po = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
      |  CAST(SUM(CASE WHEN tr = 1 AND po = 1 THEN cents ELSE 0 END) AS BIGINT) AS cents_t_post,
      |  CAST(SUM(CASE WHEN tr = 0 AND po = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
      |  CAST(SUM(CASE WHEN tr = 0 AND po = 0 THEN cents ELSE 0 END) AS BIGINT) AS cents_c_pre,
      |  CAST(SUM(CASE WHEN tr = 0 AND po = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
      |  CAST(SUM(CASE WHEN tr = 0 AND po = 1 THEN cents ELSE 0 END) AS BIGINT) AS cents_c_post
      |FROM o)
      |SELECT *, round(((CAST(cents_t_post AS DOUBLE) / n_t_post
      |    - CAST(cents_t_pre AS DOUBLE) / n_t_pre)
      |  - (CAST(cents_c_post AS DOUBLE) / n_c_post
      |    - CAST(cents_c_pre AS DOUBLE) / n_c_pre)) / 100.0, 4) AS did_dollars
      |FROM a""".stripMargin

  // ---- graph_ppr (rows-only — iterate-to-fixpoint, the
  //      graph_pagerank convention; exact integer ranks make
  //      rows-only a determinism statement, not an excuse):
  //      PERSONALIZED PageRank on the customer→supplier purchase
  //      graph, restarted at the three smallest customer nodes —
  //      "suppliers most related to THESE buyers", the
  //      recommendation shape global PageRank can't answer. ----
  val graphPpr: Q = (s, d) => {
    val edges = lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
    val seeds = edges.select(col("src")).distinct()
      .orderBy(col("src")).limit(3)
    graft.operators.PageRank.personalized(edges, "src", "dst",
        seeds, "src", iters = 4)
      .filter(col("rank") > 0)
      .orderBy(col("rank").desc, col("node").asc)
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "graph_ppr" -> graphPpr,
    "q148_wilcoxon" -> q148Wilcoxon,
    "q149_kendall" -> q149Kendall,
    "q150_link_prediction" -> q150LinkPrediction,
    "q151_kaplan_meier" -> q151KaplanMeier,
    "q152_log_rank" -> q152LogRank,
    "q153_isotonic" -> q153Isotonic,
    "q154_did" -> q154Did)

  val oracles: Map[String, String] = Map(
    "q148_wilcoxon" -> q148Oracle,
    "q149_kendall" -> q149Oracle,
    "q150_link_prediction" -> q150Oracle,
    "q151_kaplan_meier" -> q151Oracle,
    "q152_log_rank" -> q152Oracle,
    "q154_did" -> q154Oracle)
}

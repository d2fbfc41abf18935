package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, RankCorr}
import graft.sources.TableCatalog._

/** Round-14 additions: the paired rank test, tie-corrected pair
  * concordance, and structural link prediction.
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

  val q148Oracle: String =
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
      |FROM a ORDER BY nation""".stripMargin

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

  val queries: Map[String, Q] = Map(
    "q148_wilcoxon" -> q148Wilcoxon,
    "q149_kendall" -> q149Kendall,
    "q150_link_prediction" -> q150LinkPrediction)

  val oracles: Map[String, String] = Map(
    "q148_wilcoxon" -> q148Oracle,
    "q149_kendall" -> q149Oracle,
    "q150_link_prediction" -> q150Oracle)
}

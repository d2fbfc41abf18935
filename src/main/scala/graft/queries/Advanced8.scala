package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DailySeries, Ols}
import graft.sources.TableCatalog._

/** Round-15 additions: grouped multivariate OLS on exact integer
  * Cramer algebra (the classical-analytics step above q71/q84's
  * single-covariate slope) and Holt–Winters additive seasonal
  * forecasting (the top of the q133 → q162 forecasting ladder).
  *
  * Same oracle-parity discipline as [[Advanced7]]: exact integer /
  * DECIMAL statistics, doubles only in single divisions of exact
  * integers or in fixed IEEE formulas shared verbatim with the
  * DuckDB oracle ([[Ols.r2Sql]]).
  */
object Advanced8 {

  type Q = (SparkSession, String) => DataFrame

  // ---- q169: per-nation two-covariate OLS — price_cents ~ quantity
  //      + discount_pct across each supplier nation's line items.
  //      The 3×3 normal equations solve as Cramer determinants over
  //      exact integer moments (shared cofactor SQL texts), each
  //      coefficient ONE double division rounded 6, R² the ONE
  //      shared IEEE formula. Fully distributed; named magnitude
  //      refusal ~10⁹ rows/group (fitFromGram is the beyond-10⁹
  //      path). ----
  val q169Ols: Q = (s, d) => {
    val li = lineitem(s, d)
      .join(supplier(s, d).select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey").as("nation")), "l_suppkey")
      .select(col("nation"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100).cast("long").as("x2"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
    Ols.fitGrouped2(li, "nation", "x1", "x2", "y")
      .orderBy(col("nation"))
  }

  val q169Oracle: String =
    s"""WITH e AS (SELECT s_nationkey AS nation,
      |        CAST(l_quantity AS HUGEINT) AS x1,
      |        CAST(round(l_discount * 100) AS HUGEINT) AS x2,
      |        CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
      |      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey),
      |m AS (SELECT nation, CAST(COUNT(*) AS HUGEINT) AS n,
      |        SUM(x1) AS sx1, SUM(x2) AS sx2,
      |        SUM(x1 * x1) AS sx1x1, SUM(x2 * x2) AS sx2x2,
      |        SUM(x1 * x2) AS sx1x2, SUM(y) AS sy,
      |        SUM(x1 * y) AS sx1y, SUM(x2 * y) AS sx2y,
      |        SUM(y * y) AS syy
      |      FROM e GROUP BY 1),
      |dets AS (SELECT nation, n, sy, sx1y, sx2y, syy,
      |        ${Ols.detSql} AS det, ${Ols.d0Sql} AS d0,
      |        ${Ols.d1Sql} AS d1, ${Ols.d2Sql} AS d2
      |      FROM m)
      |SELECT nation, CAST(n AS BIGINT) AS n,
      |  ${Ols.coefSql("d0")} AS b0,
      |  ${Ols.coefSql("d1")} AS b1,
      |  ${Ols.coefSql("d2")} AS b2,
      |  ${Ols.r2Sql} AS r2
      |FROM dets ORDER BY nation""".stripMargin

  // ---- q170: Holt–Winters additive weekly-seasonal smoothing of
  //      daily order revenue with a 7-day forecast fan — rows-only
  //      (the driver recursion is float-sequential; the q162
  //      adjudication). ----
  val q170HoltWinters: Q = (s, d) => {
    val daily = orders(s, d)
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    DailySeries.holtWinters(daily).orderBy(col("day"))
  }

  val queries: Map[String, Q] = Map(
    "q169_ols" -> q169Ols,
    "q170_holt_winters" -> q170HoltWinters)

  val oracles: Map[String, String] = Map(
    "q169_ols" -> q169Oracle)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{DailySeries, GroupTests, Ols, RankCorr, RobustStats}
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
      |        ${Ols.d1Sql} AS d1, ${Ols.d2Sql} AS d2,
      |        ${Ols.c00Sql} AS c00, ${Ols.c11Sql} AS c11,
      |        ${Ols.c22Sql} AS c22
      |      FROM m)
      |SELECT nation, CAST(n AS BIGINT) AS n,
      |  ${Ols.coefSql("d0")} AS b0,
      |  ${Ols.coefSql("d1")} AS b1,
      |  ${Ols.coefSql("d2")} AS b2,
      |  ${Ols.seSql("c00")} AS se0,
      |  ${Ols.seSql("c11")} AS se1,
      |  ${Ols.seSql("c22")} AS se2,
      |  ${Ols.tSql("d0", "c00")} AS t0,
      |  ${Ols.tSql("d1", "c11")} AS t1,
      |  ${Ols.tSql("d2", "c22")} AS t2,
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
    // gap-free contract: holtWinters REFUSES gapped series (a missing
    // day would silently rotate every later weekday's seasonal index —
    // which the sparse sf0.001/sf0.01 corpora actually trigger), so
    // fill the calendar axis with zero-revenue days first
    // (date-cardinality sequence, the q162 interpolation idiom)
    val axis = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val filled = axis.join(daily, Seq("day"), "left")
      .na.fill(0L, Seq("rev"))
    DailySeries.holtWinters(filled).orderBy(col("day"))
  }

  // ---- q171: McNemar's paired urgency flip — "did the SAME
  //      customers' use of URGENT priority change from 1995 to
  //      1996?": only discordant customers carry information; the
  //      paired-binary sibling of q148's Wilcoxon. chi2_ppm exact
  //      (square numerator -> floor == truncation both engines). ----
  val q171Mcnemar: Q = (s, d) => {
    val o = orders(s, d)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1995, 1996))
      .groupBy(col("o_custkey"), col("yr"))
      .agg(max(when(col("o_orderpriority") === "1-URGENT", 1)
        .otherwise(0)).as("u"))
    val pairs = o.filter(col("yr") === 1995)
      .select(col("o_custkey").as("ck"), (col("u") === 1).as("x"))
      .join(o.filter(col("yr") === 1996)
        .select(col("o_custkey").as("ck"), (col("u") === 1).as("y")),
        Seq("ck"))
      .join(customer(s, d).select(col("c_custkey").as("ck"),
        col("c_nationkey").as("nation")), Seq("ck"))
    GroupTests.mcnemar(pairs, "nation", "x", "y").orderBy(col("nation"))
  }

  val q171Oracle: String =
    """WITH o AS (SELECT o_custkey, EXTRACT(year FROM o_orderdate) AS yr,
      |        MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
      |          AS u
      |      FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
      |      GROUP BY 1, 2),
      |p AS (SELECT c_nationkey AS nation, a.u AS x, b.u AS y
      |      FROM o a JOIN o b ON a.o_custkey = b.o_custkey
      |        AND a.yr = 1995 AND b.yr = 1996
      |      JOIN customer ON c_custkey = a.o_custkey),
      |agg AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |        CAST(SUM(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
      |          AS BIGINT) AS b,
      |        CAST(SUM(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
      |          AS BIGINT) AS c
      |      FROM p GROUP BY 1)
      |SELECT nation, n_pairs, b, c,
      |  CASE WHEN b + c > 0 THEN
      |    CAST(CAST(b - c AS HUGEINT) * (b - c) * 1000000 // (b + c)
      |      AS BIGINT) ELSE NULL END AS chi2_ppm,
      |  CASE WHEN b + c > 0 THEN
      |    round(CAST(CAST(b - c AS HUGEINT) * (b - c) * 1000000 // (b + c)
      |      AS DOUBLE) / 1000000.0, 6) ELSE NULL END AS chi2
      |FROM agg ORDER BY nation""".stripMargin

  // ---- q172: Cochran's Q — "does a customer's propensity to order
  //      at all differ across the years 1993-1997?": blocks =
  //      customers (complete by grid construction), treatments =
  //      years, x = placed >= 1 order that year; per market segment.
  //      num/den exact integers, Q the one double division. ----
  val q172CochranQ: Q = (s, d) => {
    import s.implicits._
    val yrs = (1993 to 1997).map(_.toLong).toDF("trt")
    val grid = customer(s, d)
      .select(col("c_custkey").as("b"), col("c_mktsegment").as("seg"))
      .crossJoin(broadcast(yrs))
    val hits = orders(s, d)
      .select(col("o_custkey").as("b"),
        year(col("o_orderdate")).cast("long").as("trt"))
      .filter(col("trt").between(1993, 1997))
      .distinct()
      .withColumn("hit", lit(1))
    val x = grid.join(hits, Seq("b", "trt"), "left")
      .select(col("seg"), col("b"), col("trt"),
        coalesce(col("hit"), lit(0)).as("x"))
    GroupTests.cochranQ(x, "seg", "b", "trt", "x").orderBy(col("seg"))
  }

  val q172Oracle: String =
    """WITH yrs AS (SELECT UNNEST([1993, 1994, 1995, 1996, 1997]) AS trt),
      |grid AS (SELECT c_custkey AS b, c_mktsegment AS seg, trt
      |      FROM customer CROSS JOIN yrs),
      |hits AS (SELECT DISTINCT o_custkey AS b,
      |        EXTRACT(year FROM o_orderdate) AS trt
      |      FROM orders
      |      WHERE EXTRACT(year FROM o_orderdate) BETWEEN 1993 AND 1997),
      |x AS (SELECT g.seg, g.b, g.trt,
      |        CASE WHEN h.b IS NULL THEN 0 ELSE 1 END AS x
      |      FROM grid g LEFT JOIN hits h ON g.b = h.b AND g.trt = h.trt),
      |kg AS (SELECT seg, CAST(COUNT(DISTINCT trt) AS BIGINT) AS k
      |      FROM x GROUP BY 1),
      |colt AS (SELECT seg, SUM(CAST(t AS HUGEINT) * t) AS t2,
      |        CAST(SUM(t) AS HUGEINT) AS s
      |      FROM (SELECT seg, trt, SUM(x) AS t FROM x GROUP BY 1, 2)
      |      GROUP BY 1),
      |rowr AS (SELECT seg, SUM(CAST(r AS HUGEINT) * r) AS r2,
      |        CAST(COUNT(*) AS BIGINT) AS n_blocks
      |      FROM (SELECT seg, b, SUM(x) AS r FROM x GROUP BY 1, 2)
      |      GROUP BY 1),
      |agg AS (SELECT seg, k, n_blocks,
      |        CAST((k - 1) * (k * t2 - s * s) AS BIGINT) AS num,
      |        CAST(k * s - r2 AS BIGINT) AS den
      |      FROM colt JOIN rowr USING (seg) JOIN kg USING (seg))
      |SELECT seg, k, n_blocks, num, den,
      |  CASE WHEN den > 0 THEN
      |    round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
      |  ELSE NULL END AS q
      |FROM agg ORDER BY seg""".stripMargin

  // ---- q173: Goodman-Kruskal gamma + Somers' D between quantity
  //      and discount per return flag — the ordinal-association
  //      family on q149's joint-cell pair algebra (cells^2, never
  //      rows^2); gamma ignores all ties, Somers' D penalizes ties
  //      on the dependent side only. ----
  val q173Gamma: Q = (s, d) => {
    val li = lineitem(s, d).select(col("l_returnflag").as("mode"),
      col("l_quantity").cast("long").as("qty"),
      round(col("l_discount") * 100).cast("long").as("disc"))
    RankCorr.gammaSomers(li, "mode", "qty", "disc").orderBy(col("mode"))
  }

  val q173Oracle: String =
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
      |nt AS (SELECT mode, CAST(SUM(cnt) AS BIGINT) AS n,
      |        SUM(CAST(cnt AS HUGEINT) * (cnt - 1)) AS txy
      |      FROM cells GROUP BY 1),
      |dens AS (SELECT mode, n, CAST(COALESCE(s, 0) AS HUGEINT) AS sd,
      |        CAST(n AS HUGEINT) * (n - 1) - tx - ty + txy AS cd2,
      |        CAST(n AS HUGEINT) * (n - 1) - tx AS notx2,
      |        CAST(n AS HUGEINT) * (n - 1) - ty AS noty2
      |      FROM nt LEFT JOIN s USING (mode) JOIN tx USING (mode)
      |        JOIN ty USING (mode))
      |SELECT mode, n, CAST(sd AS BIGINT) AS s,
      |  CASE WHEN cd2 > 0 THEN
      |    round(CAST(sd AS DOUBLE) / CAST(cd2 AS DOUBLE), 6)
      |  ELSE NULL END AS gamma,
      |  CASE WHEN notx2 > 0 THEN
      |    round(CAST(sd AS DOUBLE) / CAST(notx2 AS DOUBLE), 6)
      |  ELSE NULL END AS d_yx,
      |  CASE WHEN noty2 > 0 THEN
      |    round(CAST(sd AS DOUBLE) / CAST(noty2 AS DOUBLE), 6)
      |  ELSE NULL END AS d_xy
      |FROM dens ORDER BY mode""".stripMargin

  // ---- q174: Theil-Sen robust slope of each nation's monthly
  //      revenue trend — the point-estimate companion of q112's
  //      Mann-Kendall trend test (same calendar-bounded pair
  //      algebra, slope instead of sign); lower-median selection
  //      keeps both engines on the same single order statistic. ----
  val q174TheilSen: Q = (s, d) => {
    val monthly = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").as("nation")), Seq("o_custkey"))
      .groupBy(col("nation"),
        ((year(col("o_orderdate")) - 1992) * 12
          + month(col("o_orderdate"))).cast("long").as("mi"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    RobustStats.theilSen(monthly, "nation", "mi", "rev")
      .orderBy(col("nation"))
  }

  val q174Oracle: String =
    """WITH m AS (SELECT c_nationkey AS nation,
      |        (EXTRACT(year FROM o_orderdate) - 1992) * 12
      |          + EXTRACT(month FROM o_orderdate) AS mi,
      |        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
      |          AS BIGINT) AS rev
      |      FROM orders JOIN customer ON c_custkey = o_custkey
      |      GROUP BY 1, 2),
      |p AS (SELECT a.nation,
      |        CAST(b.rev - a.rev AS DOUBLE) / CAST(b.mi - a.mi AS DOUBLE)
      |          AS sl
      |      FROM m a JOIN m b ON a.nation = b.nation AND a.mi < b.mi),
      |ms AS (SELECT nation, sl AS slope, m AS n_pairs FROM
      |        (SELECT nation, sl,
      |          ROW_NUMBER() OVER (PARTITION BY nation ORDER BY sl) AS rn,
      |          CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT) AS m
      |        FROM p) WHERE rn = (m + 1) // 2),
      |r AS (SELECT nation, slope, n_pairs,
      |        CAST(rev AS DOUBLE) - slope * CAST(mi AS DOUBLE) AS r
      |      FROM m JOIN ms USING (nation))
      |SELECT nation, np AS n_points, n_pairs,
      |  slope, r AS intercept FROM
      |    (SELECT nation, slope, n_pairs, r,
      |      ROW_NUMBER() OVER (PARTITION BY nation ORDER BY r) AS rn,
      |      CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT) AS np
      |    FROM r) WHERE rn = (np + 1) // 2
      |ORDER BY nation""".stripMargin

  // ---- q175: Page's trend test — "does monthly revenue DECREASE
  //      along the priority ladder?": ordered treatments = priority
  //      level 1..5, blocks = complete months, per region — the
  //      ordered-alternative sibling of q164's Friedman (exactly as
  //      q165's JT is of q155's KW). 2L exact; z the shared-text
  //      no-tie formula. ----
  val q175Page: Q = (s, d) => {
    val monthly = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey")), Seq("o_custkey"))
      .join(nation(s, d).select(col("n_nationkey").as("c_nationkey"),
        col("n_regionkey").as("region")), Seq("c_nationkey"))
      .groupBy(col("region"), trunc(col("o_orderdate"), "month").as("mon"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("prio"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    val k = monthly.select(col("prio")).distinct().count()
    val complete = monthly.groupBy(col("region"), col("mon"))
      .agg(count(lit(1)).as("c")).filter(col("c") === k)
      .select(col("region"), col("mon"))
    RankCorr.pageTrend(monthly.join(complete, Seq("region", "mon")),
        "region", "mon", "prio", "rev")
      .orderBy(col("region"))
  }

  val q175Oracle: String =
    s"""WITH monthly AS (SELECT n_regionkey AS region,
      |        date_trunc('month', o_orderdate) AS mon,
      |        CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio,
      |        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |          AS rev
      |      FROM orders JOIN customer ON c_custkey = o_custkey
      |      JOIN nation ON n_nationkey = c_nationkey
      |      GROUP BY 1, 2, 3),
      |kk AS (SELECT COUNT(DISTINCT prio) AS kglob FROM monthly),
      |complete AS (SELECT region, mon FROM monthly, kk
      |      GROUP BY region, mon, kglob HAVING COUNT(*) = kglob),
      |cells AS (SELECT m.* FROM monthly m JOIN complete USING (region, mon)),
      |m2 AS (SELECT region, mon, prio,
      |        2 * (RANK() OVER (PARTITION BY region, mon ORDER BY rev) - 1)
      |          + CAST(COUNT(*) OVER (PARTITION BY region, mon, rev)
      |            AS BIGINT) + 1 AS m2
      |      FROM cells),
      |ord AS (SELECT region, prio,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY region ORDER BY prio)
      |          AS BIGINT) AS ord
      |      FROM (SELECT DISTINCT region, prio FROM cells)),
      |kg AS (SELECT region, CAST(COUNT(DISTINCT prio) AS BIGINT) AS k
      |      FROM cells GROUP BY 1),
      |agg AS (SELECT region,
      |        CAST(SUM(CAST(ord AS HUGEINT) * m2) AS BIGINT) AS l2,
      |        CAST(COUNT(DISTINCT mon) AS BIGINT) AS n_blocks
      |      FROM m2 JOIN ord USING (region, prio) GROUP BY 1)
      |SELECT region, k, n_blocks, l2,
      |  CASE WHEN k >= 3 AND n_blocks >= 2 THEN
      |    round(${RankCorr.pageZFormulaSql}, 6)
      |  ELSE NULL END AS z
      |FROM agg JOIN kg USING (region) ORDER BY region""".stripMargin

  // ---- q176: Brown-Forsythe dispersion-equality test — "do the
  //      five market segments' order values have equal SPREAD per
  //      year?": the variance complement of q155/q156/q157's
  //      location battery; ANOVA F on |v - sample median|, exact
  //      end-to-end (nearest-rank medians + integer deviations +
  //      the shared anova formula). Whole dollars (the q156
  //      magnitude contract). ----
  val q176BrownForsythe: Q = (s, d) => {
    val os = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), Seq("o_custkey"))
      .select(year(col("o_orderdate")).as("yr"), col("seg"),
        round(col("o_totalprice")).cast("long").as("dollars"))
    GroupTests.brownForsythe(os, "yr", "seg", "dollars")
      .orderBy(col("yr"))
  }

  val q176Oracle: String =
    s"""WITH os AS (SELECT EXTRACT(year FROM o_orderdate) AS yr,
      |        c_mktsegment AS seg,
      |        CAST(round(o_totalprice) AS BIGINT) AS v
      |      FROM orders JOIN customer ON c_custkey = o_custkey),
      |med AS (SELECT yr, seg, v AS med FROM
      |        (SELECT yr, seg, v,
      |          ROW_NUMBER() OVER (PARTITION BY yr, seg ORDER BY v) AS rn,
      |          CAST(COUNT(*) OVER (PARTITION BY yr, seg) AS BIGINT) AS n_j
      |        FROM os) WHERE rn = (n_j + 1) // 2),
      |z AS (SELECT os.yr, os.seg, abs(os.v - med.med) AS z
      |      FROM os JOIN med ON os.yr = med.yr AND os.seg = med.seg),
      |per AS (SELECT yr, seg, CAST(COUNT(*) AS BIGINT) AS n_j,
      |        SUM(CAST(z AS HUGEINT)) AS s_j,
      |        SUM(CAST(z AS HUGEINT) * z) AS q_j
      |      FROM z GROUP BY 1, 2),
      |agg AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS k,
      |        CAST(SUM(n_j) AS BIGINT) AS n,
      |        SUM(s_j) AS s, SUM(q_j) AS q,
      |        SUM(s_j * s_j // n_j) AS bsum
      |      FROM per GROUP BY 1),
      |sq AS (SELECT yr, k, n,
      |        CAST(bsum - (s * s // n) AS BIGINT) AS ssb,
      |        CAST(q - bsum AS BIGINT) AS ssw
      |      FROM agg)
      |SELECT yr, k, n, ssb, ssw,
      |  CASE WHEN k > 1 AND n > k AND ssw > 0 THEN
      |    round(${GroupTests.anovaFFormulaSql}, 6) ELSE NULL END AS f,
      |  CASE WHEN ssb + ssw > 0 THEN
      |    round(CAST(ssb AS DOUBLE) / CAST(ssb + ssw AS DOUBLE), 6)
      |  ELSE NULL END AS eta2
      |FROM sq ORDER BY yr""".stripMargin

  // ---- q177: Mann-Whitney rank-sum — "do BUILDING customers place
  //      larger orders than AUTOMOBILE customers?" per year: the
  //      UNPAIRED two-sample location test next to q148's paired
  //      Wilcoxon; pooled doubled midranks, 2U exact, shared-text
  //      tie-corrected z. ----
  val q177MannWhitney: Q = (s, d) => {
    val os = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("seg")), Seq("o_custkey"))
      .filter(col("seg").isin("BUILDING", "AUTOMOBILE"))
      .select(year(col("o_orderdate")).as("yr"), col("seg"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    RankCorr.mannWhitney(os, "yr", "seg", "cents", "BUILDING")
      .orderBy(col("yr"))
  }

  val q177Oracle: String =
    s"""WITH os AS (SELECT EXTRACT(year FROM o_orderdate) AS yr,
      |        c_mktsegment AS seg,
      |        CAST(round(o_totalprice * 100) AS BIGINT) AS v
      |      FROM orders JOIN customer ON c_custkey = o_custkey
      |      WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
      |cells AS (SELECT yr, seg, v, CAST(COUNT(*) AS BIGINT) AS cnt
      |      FROM os GROUP BY 1, 2, 3),
      |pooled AS (SELECT yr, v, CAST(SUM(cnt) AS BIGINT) AS cnt
      |      FROM cells GROUP BY 1, 2),
      |m2 AS (SELECT yr, v,
      |        2 * (SUM(cnt) OVER (PARTITION BY yr ORDER BY v
      |          ROWS UNBOUNDED PRECEDING) - cnt) + cnt + 1 AS m2
      |      FROM pooled),
      |ties AS (SELECT yr,
      |        CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS BIGINT)
      |          AS t3t,
      |        CAST(SUM(cnt) AS BIGINT) AS n
      |      FROM pooled GROUP BY 1),
      |agg AS (SELECT c.yr,
      |        CAST(SUM(CASE WHEN c.seg = 'BUILDING' THEN c.cnt
      |          ELSE 0 END) AS BIGINT) AS na,
      |        CAST(SUM(CASE WHEN c.seg <> 'BUILDING' THEN c.cnt
      |          ELSE 0 END) AS BIGINT) AS nb,
      |        SUM(CASE WHEN c.seg = 'BUILDING'
      |          THEN CAST(c.cnt AS HUGEINT) * m2.m2 ELSE 0 END) AS r2a
      |      FROM cells c JOIN m2 ON c.yr = m2.yr AND c.v = m2.v
      |      GROUP BY 1)
      |SELECT yr, na, nb, u2,
      |  CASE WHEN na > 0 AND nb > 0 AND
      |      ${RankCorr.mwVarGuardSql} > 0 THEN
      |    round(${RankCorr.mwZFormulaSql}, 6)
      |  ELSE NULL END AS z
      |FROM (SELECT yr, na, nb,
      |        CAST(r2a - CAST(na AS HUGEINT) * (na + 1) AS BIGINT) AS u2,
      |        n, t3t
      |      FROM agg JOIN ties USING (yr)) q_
      |ORDER BY yr""".stripMargin

  // ---- q178: exact skewness + excess kurtosis of order totals per
  //      year (KILOdollars — the quartic magnitude contract): the
  //      distribution-shape pair read before trusting q156's
  //      normal-theory F; the n-powers cancel in A3/A2^1.5 and
  //      A4/A2², leaving shared-text doubles over exact integers. ----
  val q178SkewKurtosis: Q = (s, d) =>
    GroupTests.skewKurtosis(
      orders(s, d).select(year(col("o_orderdate")).as("yr"),
        round(col("o_totalprice") / 1000).cast("long").as("kd")),
      "yr", "kd")
      .orderBy(col("yr"))

  val q178Oracle: String =
    s"""WITH v AS (SELECT EXTRACT(year FROM o_orderdate) AS yr,
      |        CAST(round(o_totalprice / 1000) AS HUGEINT) AS v
      |      FROM orders),
      |m AS (SELECT yr, CAST(COUNT(*) AS HUGEINT) AS n,
      |        SUM(v) AS s, SUM(v * v) AS q,
      |        SUM(v * v * v) AS c, SUM(v * v * v * v) AS d
      |      FROM v GROUP BY 1),
      |a AS (SELECT yr, CAST(n AS BIGINT) AS n,
      |        n * q - s * s AS a2,
      |        n * n * c - 3 * n * s * q + 2 * s * s * s AS a3,
      |        n * n * n * d - 4 * n * n * s * c + 6 * n * s * s * q
      |          - 3 * s * s * s * s AS a4
      |      FROM m)
      |SELECT yr, n, CAST(a2 AS BIGINT) AS a2,
      |  CASE WHEN n >= 2 AND a2 > 0 THEN
      |    round(${GroupTests.skewFormulaSql}, 6) ELSE NULL END AS skewness,
      |  CASE WHEN n >= 2 AND a2 > 0 THEN
      |    round(${GroupTests.kurtFormulaSql}, 6)
      |  ELSE NULL END AS kurtosis_excess
      |FROM a ORDER BY yr""".stripMargin

  // ---- q179: Kendall's W — "how concordant are the months'
  //      segment-revenue rankings within each region?": friedman's
  //      chi-square rescaled to the [0,1] inter-rater agreement
  //      coefficient; same complete-months input as q164, same
  //      refusals, one extra exact division. ----
  val q179KendallW: Q = (s, d) => {
    val monthly = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey"), col("c_mktsegment").as("seg")),
        Seq("o_custkey"))
      .join(nation(s, d).select(col("n_nationkey").as("c_nationkey"),
        col("n_regionkey").as("region")), Seq("c_nationkey"))
      .groupBy(col("region"), trunc(col("o_orderdate"), "month").as("mon"),
        col("seg"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
    val k = monthly.select(col("seg")).distinct().count()
    val complete = monthly.groupBy(col("region"), col("mon"))
      .agg(count(lit(1)).as("c")).filter(col("c") === k)
      .select(col("region"), col("mon"))
    RankCorr.kendallW(monthly.join(complete, Seq("region", "mon")),
        "region", "mon", "seg", "rev")
      .orderBy(col("region"))
  }

  val q179Oracle: String = Advanced7.friedmanAggSql +
    """
      |SELECT region, k, CAST(n_blocks AS BIGINT) AS n_blocks,
      |  CAST(num AS BIGINT) AS num, CAST(den AS BIGINT) AS den,
      |  CASE WHEN den > 0 AND k > 1 THEN
      |    round(CAST(num AS DOUBLE)
      |      / CAST(den * n_blocks * (k - 1) AS DOUBLE), 6)
      |  ELSE NULL END AS w
      |FROM agg ORDER BY region""".stripMargin

  // ---- q180: MULTIVARIATE OLS on the Gram scale path — the d>2
  //      form q169's exact algebra can't reach: price_cents ~
  //      quantity + discount_pct + tax_pct per supplier nation, on
  //      the mergeable double-moment Gram aggregate + model-sized
  //      driver solve. Rows-only (double moments: deterministic to
  //      ulps, not hash-exact — the emb_pca convention); parity with
  //      the exact path is OlsSpec's cross-path identity. ----
  val q180OlsGram: Q = (s, d) => {
    val li = lineitem(s, d)
      .join(supplier(s, d).select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey").as("nation")), "l_suppkey")
      .select(col("nation"),
        col("l_quantity").cast("double").as("x1"),
        round(col("l_discount") * 100).cast("double").as("x2"),
        round(col("l_tax") * 100).cast("double").as("x3"),
        round(col("l_extendedprice") * 100).cast("double").as("y"))
    Ols.fitFromGram(li, "nation", Seq("x1", "x2", "x3"), "y")
      .select(col("nation"), col("n"),
        col("coefs").getItem(0).as("b0"),
        col("coefs").getItem(1).as("b1"),
        col("coefs").getItem(2).as("b2"),
        col("coefs").getItem(3).as("b3"),
        col("r2"))
      .orderBy(col("nation"))
  }

  // ---- q181: TWO-WAY ANOVA with interaction — "do market segment
  //      and order year shape order value, separately or jointly?"
  //      per region: the apex of the K-sample battery (q156 is
  //      one-way). SS_A/SS_B/SS_AB/SS_W from the same exact per-cell
  //      (n, Σv, Σv²) sufficient statistics, per-cell unit-scale
  //      floors keeping every sum order-free, three shared-text F
  //      formulas; whole dollars (the q156 magnitude contract),
  //      in-plan magnitude gate from day one. ----
  val q181Anova2: Q = (s, d) => {
    val os = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey"), col("c_mktsegment").as("seg")),
        Seq("o_custkey"))
      .join(nation(s, d).select(col("n_nationkey").as("c_nationkey"),
        col("n_regionkey").as("region")), Seq("c_nationkey"))
      .select(col("region"), col("seg"),
        year(col("o_orderdate")).as("yr"),
        round(col("o_totalprice")).cast("long").as("dollars"))
    GroupTests.anovaTwoWay(os, "region", "seg", "yr", "dollars")
      .orderBy(col("region"))
  }

  val q181Oracle: String =
    s"""WITH os AS (SELECT n_regionkey AS g, c_mktsegment AS fa,
      |        EXTRACT(year FROM o_orderdate) AS fb,
      |        CAST(round(o_totalprice) AS HUGEINT) AS v
      |      FROM orders JOIN customer ON c_custkey = o_custkey
      |      JOIN nation ON n_nationkey = c_nationkey),
      |cells AS (SELECT g, fa, fb, CAST(COUNT(*) AS HUGEINT) AS n_c,
      |        SUM(v) AS s_c, SUM(v * v) AS q_c
      |      FROM os GROUP BY 1, 2, 3),
      |tc AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_cells,
      |        CAST(SUM(n_c) AS BIGINT) AS n, SUM(s_c) AS s,
      |        SUM(q_c) AS q, SUM(s_c * s_c // n_c) AS t_cells
      |      FROM cells GROUP BY 1),
      |ta AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS a_lvls,
      |        SUM(s_m * s_m // n_m) AS t_a
      |      FROM (SELECT g, fa, SUM(n_c) AS n_m, SUM(s_c) AS s_m
      |            FROM cells GROUP BY 1, 2) GROUP BY 1),
      |tb AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS b_lvls,
      |        SUM(s_m * s_m // n_m) AS t_b
      |      FROM (SELECT g, fb, SUM(n_c) AS n_m, SUM(s_c) AS s_m
      |            FROM cells GROUP BY 1, 2) GROUP BY 1),
      |agg AS (SELECT g AS region, a_lvls, b_lvls, n_cells, n,
      |        CAST(t_a - (s * s // n) AS BIGINT) AS ssa,
      |        CAST(t_b - (s * s // n) AS BIGINT) AS ssb,
      |        CAST(t_cells - t_a - t_b + (s * s // n) AS BIGINT) AS ssab,
      |        CAST(q - t_cells AS BIGINT) AS ssw
      |      FROM tc JOIN ta USING (g) JOIN tb USING (g))
      |SELECT region, a_lvls, b_lvls, n_cells, n, ssa, ssb, ssab, ssw,
      |  CASE WHEN a_lvls > 1 AND n > n_cells AND ssw > 0 AND ssa >= 0
      |    THEN round(${GroupTests.anova2FaSql}, 6) ELSE NULL END AS f_a,
      |  CASE WHEN b_lvls > 1 AND n > n_cells AND ssw > 0 AND ssb >= 0
      |    THEN round(${GroupTests.anova2FbSql}, 6) ELSE NULL END AS f_b,
      |  CASE WHEN n_cells - a_lvls - b_lvls + 1 >= 1 AND n > n_cells
      |      AND ssw > 0 AND ssab >= 0
      |    THEN round(${GroupTests.anova2FabSql}, 6) ELSE NULL END AS f_ab
      |FROM agg ORDER BY region""".stripMargin

  // ---- q182: RIDGE REGRESSION on the exact path — q169's fit with
  //      an integral L2 penalty on the covariate diagonal: the
  //      penalized Cramer determinants stay polynomial in the same
  //      exact integer moments, so per-nation REGULARIZED fits are
  //      oracle-exact (λ=0 rows equal q169's coefficients
  //      bit-for-bit — OlsSpec's cross-operator identity). λ is in
  //      raw-moment units (quantity²-scale here). ----
  val q182Ridge: Q = (s, d) => {
    val li = lineitem(s, d)
      .join(supplier(s, d).select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey").as("nation")), "l_suppkey")
      .select(col("nation"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100).cast("long").as("x2"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
    Ols.ridgeGrouped2(li, "nation", "x1", "x2", "y",
        Seq(0L, 1000000000L))
      .orderBy(col("nation"), col("lambda"))
  }

  val q182Oracle: String =
    s"""WITH e AS (SELECT s_nationkey AS nation,
      |        CAST(l_quantity AS HUGEINT) AS x1,
      |        CAST(round(l_discount * 100) AS HUGEINT) AS x2,
      |        CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
      |      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey),
      |m AS (SELECT nation, CAST(COUNT(*) AS HUGEINT) AS n,
      |        SUM(x1) AS sx1, SUM(x2) AS sx2,
      |        SUM(x1 * x1) AS sx1x1, SUM(x2 * x2) AS sx2x2,
      |        SUM(x1 * x2) AS sx1x2, SUM(y) AS sy,
      |        SUM(x1 * y) AS sx1y, SUM(x2 * y) AS sx2y
      |      FROM e GROUP BY 1),
      |lam AS (SELECT UNNEST([0, 1000000000]) AS lambda),
      |r AS (SELECT nation, lambda, n, sx1, sx2, sx1x2, sy, sx1y, sx2y,
      |        sx1x1 + lambda AS rx1x1, sx2x2 + lambda AS rx2x2
      |      FROM m CROSS JOIN lam),
      |dets AS (SELECT nation, lambda, n,
      |        ${Ols.rdetSql} AS det, ${Ols.rd0Sql} AS d0,
      |        ${Ols.rd1Sql} AS d1, ${Ols.rd2Sql} AS d2
      |      FROM r)
      |SELECT nation, CAST(lambda AS BIGINT) AS lambda,
      |  CAST(n AS BIGINT) AS n,
      |  ${Ols.coefSql("d0")} AS b0,
      |  ${Ols.coefSql("d1")} AS b1,
      |  ${Ols.coefSql("d2")} AS b2
      |FROM dets ORDER BY nation, lambda""".stripMargin

  val queries: Map[String, Q] = Map(
    "q181_anova2" -> q181Anova2,
    "q182_ridge" -> q182Ridge,
    "q169_ols" -> q169Ols,
    "q180_ols_gram" -> q180OlsGram,
    "q170_holt_winters" -> q170HoltWinters,
    "q171_mcnemar" -> q171Mcnemar,
    "q172_cochran_q" -> q172CochranQ,
    "q173_gamma" -> q173Gamma,
    "q174_theil_sen" -> q174TheilSen,
    "q175_page" -> q175Page,
    "q176_brown_forsythe" -> q176BrownForsythe,
    "q177_mann_whitney" -> q177MannWhitney,
    "q178_skew_kurtosis" -> q178SkewKurtosis,
    "q179_kendall_w" -> q179KendallW)

  val oracles: Map[String, String] = Map(
    "q181_anova2" -> q181Oracle,
    "q182_ridge" -> q182Oracle,
    "q169_ols" -> q169Oracle,
    "q171_mcnemar" -> q171Oracle,
    "q172_cochran_q" -> q172Oracle,
    "q173_gamma" -> q173Oracle,
    "q174_theil_sen" -> q174Oracle,
    "q175_page" -> q175Oracle,
    "q176_brown_forsythe" -> q176Oracle,
    "q177_mann_whitney" -> q177Oracle,
    "q178_skew_kurtosis" -> q178Oracle,
    "q179_kendall_w" -> q179Oracle)
}

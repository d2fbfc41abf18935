package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{PrefixSum, Ranking}
import graft.sources.TableCatalog._

/** Model-evaluation / distribution-audit family (round 12): next to
  * the exact ROC AUC (q105) these are the remaining reports an
  * offline-eval or data-quality pass runs over a scored corpus —
  * Gini concentration, decile lift / cumulative gains, Welch's
  * unequal-variance t-test, and calibration (reliability) bins.
  * SURVEY.md §2 rows 123–126.
  *
  * Exactness discipline (the q71/q93 conventions): every count and
  * sum is an exact integer or DECIMAL(38,0); doubles appear only in
  * a final fixed IEEE formula (÷, √ are correctly rounded and so
  * engine-deterministic) spelled identically in the DuckDB oracle,
  * with one ROUND(…, 9) at the surface. Ranks come from the
  * DISTRIBUTED [[Ranking]] operator over collision-free fixed-width
  * composite keys, never an unpartitioned window; cumulations ride
  * [[PrefixSum]].
  */
object Eval {

  type Q = (SparkSession, String) => DataFrame

  /** Exact cents of a dollars-valued DOUBLE column (decimal(18,2)
    * rounding first — the established cross-engine convention).
    */
  private def cents(c: String): org.apache.spark.sql.Column =
    (col(c).cast("decimal(18,2)") * 100).cast("long")

  /** Fixed-width zero-padded decimal rendering: lexicographic order
    * == numeric order for non-negative longs, so a concatenation of
    * these is a collision-free composite RANGE-PARTITIONABLE key.
    */
  private def pad(c: org.apache.spark.sql.Column, w: Int) =
    lpad(c.cast("string"), w, "0")

  // ---- q106: per-nation Gini coefficient of customer revenue —
  //      the inequality/concentration audit (is 1% of customers 99%
  //      of revenue?). x = per-customer exact revenue cents; within-
  //      nation ranks derive from ONE distributed global rank over
  //      the composite key (nation, revenue, custkey) minus the
  //      nation's tiny min-rank offset (25 rows, broadcast) — the
  //      few-large-groups shape where a partitioned window would put
  //      a whole nation in one task. Gini by the rank identity
  //      G = (2·Σ r·x − (n+1)·Σx) / (n·Σx), all three terms exact
  //      DECIMAL(38,0); ONE double division rounded to 9. ----
  val q106Gini: Q = (s, d) => {
    val rev = orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(cents("o_totalprice")).as("rev"))
    val nat = rev
      .join(customer(s, d).select(col("c_custkey").as("custkey"),
        col("c_nationkey").as("nationkey")), "custkey")
    val key = concat(pad(col("nationkey"), 4), pad(col("rev"), 14),
      pad(col("custkey"), 12))
    val ranked = Ranking.globalRank(nat.withColumn("__k", key), "__k", "grank")
    val base = ranked.groupBy(col("nationkey"))
      .agg(min(col("grank")).as("base"))
    val withR = ranked.join(broadcast(base), "nationkey")
      .withColumn("r", col("grank") - col("base") + lit(1L))
    withR.groupBy(col("nationkey"))
      .agg(count(lit(1)).cast("bigint").as("n_cust"),
        sum(col("rev")).cast("decimal(38,0)").as("sx"),
        sum(col("r").cast("decimal(38,0)") * col("rev")).as("srx"))
      .join(nation(s, d).select(col("n_nationkey").as("nationkey"),
        col("n_name")), "nationkey")
      .select(col("n_name"), col("n_cust"),
        col("sx").cast("bigint").as("sum_cents"),
        round((col("srx") * 2 - (col("n_cust") + 1) * col("sx"))
            .cast("double") /
          (col("n_cust").cast("decimal(38,0)") * col("sx")).cast("double"),
          9).as("gini"))
  }

  val q106Oracle: String =
    """WITH rev AS (SELECT o_custkey AS custkey,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
      |  FROM orders GROUP BY 1),
      |nat AS (SELECT r.custkey, r.rev, c.c_nationkey AS nationkey
      |  FROM rev r JOIN customer c ON c.c_custkey = r.custkey),
      |rk AS (SELECT nationkey, rev,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY nationkey
      |      ORDER BY rev, custkey) AS BIGINT) AS r
      |  FROM nat),
      |agg AS (SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
      |    CAST(SUM(rev) AS HUGEINT) AS sx,
      |    CAST(SUM(CAST(r AS HUGEINT) * rev) AS HUGEINT) AS srx
      |  FROM rk GROUP BY 1)
      |SELECT n.n_name, a.n_cust, CAST(a.sx AS BIGINT) AS sum_cents,
      |  ROUND(CAST(a.srx * 2 - (a.n_cust + 1) * a.sx AS DOUBLE) /
      |    CAST(CAST(a.n_cust AS HUGEINT) * a.sx AS DOUBLE), 9) AS gini
      |FROM agg a JOIN nation n ON n.n_nationkey = a.nationkey""".stripMargin

  // ---- q107: decile lift / cumulative gains — score the orders by
  //      totalprice, split into top-down deciles, and report how
  //      concentrated the URGENT orders are in the top deciles (the
  //      campaign-targeting evaluation). Deciles from the distributed
  //      global rank by integer floor algebra (spelled identically in
  //      the oracle); cumulation over the 10-row decile axis rides
  //      PrefixSum; lift and gain are exact-bigint ratios, ONE double
  //      division each, rounded to 9. ----
  val q107Lift: Q = (s, d) => {
    val o = orders(s, d).select(col("o_orderkey").as("ok"),
      cents("o_totalprice").as("price"),
      when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("pos"))
    val key = concat(pad(col("price"), 14), pad(col("ok"), 12))
    val ranked = Ranking.globalRank(o.withColumn("__k", key), "__k", "rank")
    val tot = ranked.agg(count(lit(1)).cast("bigint").as("n_total"),
      sum(col("pos")).cast("bigint").as("n_pos_total"))
    val perDecile = ranked.crossJoin(broadcast(tot))
      .withColumn("decile",
        expr("((n_total - rank) * 10) div n_total") + 1)
      .groupBy(col("decile").cast("bigint").as("decile"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("pos")).cast("bigint").as("n_pos"))
    PrefixSum.runningTotal(perDecile, "decile", "n_pos", "cum_pos")
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n"), col("n_pos"),
        col("cum_pos").cast("bigint").as("cum_pos"),
        round((col("n_pos") * col("n_total")).cast("double") /
          (col("n") * col("n_pos_total")).cast("double"), 9).as("lift"),
        round(col("cum_pos").cast("double") / col("n_pos_total"), 9)
          .as("cum_gain"))
  }

  val q107Oracle: String =
    """WITH o AS (SELECT o_orderkey AS ok,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
      |  FROM orders),
      |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY price, ok) AS BIGINT) AS rank,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n_total,
      |    CAST(SUM(pos) OVER () AS BIGINT) AS n_pos_total
      |  FROM o),
      |dec AS (SELECT ((n_total - rank) * 10) // n_total + 1 AS decile,
      |    n_total, n_pos_total, pos FROM rk),
      |agg AS (SELECT CAST(decile AS BIGINT) AS decile,
      |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    MAX(n_total) AS n_total, MAX(n_pos_total) AS n_pos_total
      |  FROM dec GROUP BY 1)
      |SELECT decile, n, n_pos,
      |  CAST(SUM(n_pos) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
      |  ROUND(CAST(n_pos * n_total AS DOUBLE) /
      |    CAST(n * n_pos_total AS DOUBLE), 9) AS lift,
      |  ROUND(CAST(SUM(n_pos) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
      |    n_pos_total, 9) AS cum_gain
      |FROM agg""".stripMargin

  // ---- q108: Welch's unequal-variance t-test — returned ('R') vs
  //      accepted ('A') line items on extended price: is the mean
  //      price of returned items different? Everything through the
  //      moments is exact (n, Σx, Σx² in DECIMAL(38,0); the variance
  //      numerator n·Σx² − (Σx)² exact by the q38 identity); t and
  //      the Welch–Satterthwaite df are a fixed IEEE dance of ÷, √
  //      (both correctly rounded, hence engine-deterministic) spelled
  //      identically in the oracle. t rounds to 9; df (≈ n, millions
  //      at scale) rounds to 3 — 9 decimals on a 7-digit integer part
  //      is 16 significant digits, past double precision, where
  //      ROUND implementations legitimately disagree in the last ULP. ----
  val q108Welch: Q = (s, d) => {
    val li = lineitem(s, d)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag").as("f"), cents("l_extendedprice").as("x"))
    val m = li.groupBy(col("f"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("s"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("q"))
    val w = m.agg(
      max(when(col("f") === "A", col("n"))).as("na"),
      max(when(col("f") === "A", col("s"))).as("sa"),
      max(when(col("f") === "A", col("q"))).as("qa"),
      max(when(col("f") === "R", col("n"))).as("nr"),
      max(when(col("f") === "R", col("s"))).as("sr"),
      max(when(col("f") === "R", col("q"))).as("qr"))
    val meanA = col("sa").cast("double") / col("na")
    val meanR = col("sr").cast("double") / col("nr")
    val vnA = ((col("na") * col("qa") - col("sa") * col("sa")).cast("double") /
      (col("na") * (col("na") - 1)).cast("double")) / col("na")
    val vnR = ((col("nr") * col("qr") - col("sr") * col("sr")).cast("double") /
      (col("nr") * (col("nr") - 1)).cast("double")) / col("nr")
    w.select(col("na"), col("nr"),
      round(meanA, 9).as("mean_a"), round(meanR, 9).as("mean_r"),
      round((meanA - meanR) / sqrt(vnA + vnR), 9).as("t_stat"),
      round((vnA + vnR) * (vnA + vnR) /
        (vnA * vnA / (col("na") - 1) + vnR * vnR / (col("nr") - 1)), 3)
        .as("df"))
  }

  val q108Oracle: String =
    """WITH li AS (SELECT l_returnflag AS f,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
      |m AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS HUGEINT) AS s,
      |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
      |  FROM li GROUP BY 1),
      |w AS (SELECT
      |    MAX(CASE WHEN f = 'A' THEN n END) AS na,
      |    MAX(CASE WHEN f = 'A' THEN s END) AS sa,
      |    MAX(CASE WHEN f = 'A' THEN q END) AS qa,
      |    MAX(CASE WHEN f = 'R' THEN n END) AS nr,
      |    MAX(CASE WHEN f = 'R' THEN s END) AS sr,
      |    MAX(CASE WHEN f = 'R' THEN q END) AS qr
      |  FROM m),
      |e AS (SELECT na, nr,
      |    CAST(sa AS DOUBLE) / na AS mean_a, CAST(sr AS DOUBLE) / nr AS mean_r,
      |    (CAST(na * qa - sa * sa AS DOUBLE) /
      |      CAST(na * (na - 1) AS DOUBLE)) / na AS vna,
      |    (CAST(nr * qr - sr * sr AS DOUBLE) /
      |      CAST(nr * (nr - 1) AS DOUBLE)) / nr AS vnr
      |  FROM w)
      |SELECT na, nr, ROUND(mean_a, 9) AS mean_a, ROUND(mean_r, 9) AS mean_r,
      |  ROUND((mean_a - mean_r) / SQRT(vna + vnr), 9) AS t_stat,
      |  ROUND((vna + vnr) * (vna + vnr) /
      |    (vna * vna / (na - 1) + vnr * vnr / (nr - 1)), 3) AS df
      |FROM e""".stripMargin

  // ---- q109: calibration (reliability) bins — bucket a [0,1] score
  //      into 10 bins and compare the bin's mean score against its
  //      observed positive rate (a calibrated scorer sits on the
  //      diagonal). Score = min(n_chars, 499)/500 as the stand-in
  //      scorer, label = lang='en'; the bin index is pure integer
  //      floor algebra, per-bin sums exact, the two ratios ONE double
  //      division each rounded to 9. ----
  val q109Calibration: Q = (s, d) => {
    val docs = documents(s, d).select(
      least(col("n_chars"), lit(499L)).as("sc"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    docs.groupBy(expr("(sc * 10) div 500").cast("bigint").as("bin"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("pos")).cast("bigint").as("n_pos"),
        sum(col("sc")).cast("bigint").as("sum_sc"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("sum_sc").cast("double") / (col("n") * 500), 9)
          .as("mean_score"),
        round(col("n_pos").cast("double") / col("n"), 9).as("frac_pos"))
  }

  val q109Oracle: String =
    """WITH d AS (SELECT LEAST(n_chars, 499) AS sc,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM documents)
      |SELECT CAST((sc * 10) // 500 AS BIGINT) AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(pos) AS BIGINT) AS n_pos,
      |  ROUND(CAST(SUM(sc) AS DOUBLE) / (COUNT(*) * 500), 9) AS mean_score,
      |  ROUND(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 9) AS frac_pos
      |FROM d GROUP BY 1""".stripMargin

  // ---- q113: average precision (the area under the
  //      precision-recall curve, step definition — the ranking metric
  //      that, unlike ROC AUC, stays honest under class imbalance).
  //      Same per-VALUE (pos, neg) table as q105; descending
  //      cumulations derived from ONE ascending PrefixSum pass each
  //      by the total-minus identity. AP = Σ_v (p_v/P)·(cumPos_v /
  //      cumAll_v); the per-value term is fixed-point scaled to
  //      exact integers — (p_v·cumPos_v·10¹²) div cumAll_v, floor
  //      division spelled identically in both engines (the q102
  //      floor-algebra convention), so the SUM is an exact bigint and
  //      immune to float summation order — then ONE double division
  //      by P·10¹², rounded to 9. ----
  val q113AvgPrecision: Q = (s, d) => {
    val scored = documents(s, d).select(
      col("n_chars").cast("long").as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    val perValue = scored.groupBy(col("score"))
      .agg(sum(col("pos")).as("p_at"),
        sum(lit(1L) - col("pos")).as("n_at"))
      .withColumn("all_at", col("p_at") + col("n_at"))
    val c1 = PrefixSum.runningTotal(perValue, "score", "p_at", "cp_asc")
    val c2 = PrefixSum.runningTotal(c1, "score", "all_at", "ca_asc")
    val tot = c2.agg(sum(col("p_at")).cast("bigint").as("p_total"),
      sum(col("all_at")).cast("bigint").as("n_total"))
    val terms = c2.crossJoin(broadcast(tot))
      .withColumn("cum_pos", col("p_total") - col("cp_asc") + col("p_at"))
      .withColumn("cum_all", col("n_total") - col("ca_asc") + col("all_at"))
      .withColumn("term", expr(
        "(cast(p_at as decimal(38,0)) * cum_pos * 1000000000000) div cum_all"))
    terms.agg(sum(col("term")).cast("bigint").as("ap_num"),
        max(col("p_total")).as("p_total"),
        max(col("n_total")).as("n_total"))
      .select(col("ap_num"), col("p_total"), col("n_total"),
        round(col("ap_num").cast("double") /
          (col("p_total").cast("double") * 1e12), 9).as("avg_precision"))
  }

  val q113Oracle: String =
    """WITH s AS (SELECT CAST(n_chars AS BIGINT) AS score,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM documents),
      |pv AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS p_at,
      |    CAST(SUM(1 - pos) AS BIGINT) AS n_at
      |  FROM s GROUP BY score),
      |c AS (SELECT score, p_at, p_at + n_at AS all_at,
      |    CAST(SUM(p_at) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp_asc,
      |    CAST(SUM(p_at + n_at) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca_asc,
      |    CAST(SUM(p_at) OVER () AS BIGINT) AS p_total,
      |    CAST(SUM(p_at + n_at) OVER () AS BIGINT) AS n_total
      |  FROM pv),
      |t AS (SELECT p_total, n_total,
      |    (CAST(p_at AS HUGEINT) * (p_total - cp_asc + p_at) * 1000000000000)
      |      // (n_total - ca_asc + all_at) AS term
      |  FROM c)
      |SELECT CAST(SUM(term) AS BIGINT) AS ap_num,
      |  MAX(p_total) AS p_total, MAX(n_total) AS n_total,
      |  ROUND(CAST(SUM(term) AS DOUBLE) /
      |    (CAST(MAX(p_total) AS DOUBLE) * 1e12), 9) AS avg_precision
      |FROM t""".stripMargin

  // ---- q131: CUPED variance-reduced experiment readout (Deng et al.
  //      WSDM '13 — the experimentation-platform adjustment: subtract
  //      theta·(pre-period covariate − its pooled mean) from the
  //      post-period metric, theta = cov(x,y)/var(x)). Pre = 1992-95
  //      spend cents, post = 1996+ spend cents, arm = custkey parity.
  //      All moments EXACT DECIMAL(38,0) sums (the q108 discipline);
  //      theta and the three means are a fixed IEEE dance rounded 9,
  //      spelled identically in the oracle ----
  val q131Cuped: Q = (s, d) => {
    val o = orders(s, d).select(col("o_custkey"),
      year(col("o_orderdate")).as("yr"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val per = o.groupBy(col("o_custkey"))
      .agg(sum(when(col("yr") < 1996, col("cents")).otherwise(0L))
          .cast("decimal(18,0)").as("x"),
        sum(when(col("yr") >= 1996, col("cents")).otherwise(0L))
          .cast("decimal(18,0)").as("y"))
      .withColumn("grp", pmod(col("o_custkey"), lit(2L)))
      .localCheckpoint(true)
    val pooled = per.agg(
      count(lit(1)).cast("decimal(18,0)").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"),
      sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"))
    val grouped = per.groupBy(col("grp"))
      .agg(count(lit(1)).cast("bigint").as("n_g"),
        sum(col("x")).cast("decimal(38,0)").as("sxg"),
        sum(col("y")).cast("decimal(38,0)").as("syg"))
    val theta = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val meanXPool = col("sx").cast("double") / col("n").cast("double")
    val meanXg = col("sxg").cast("double") / col("n_g").cast("double")
    val meanYg = col("syg").cast("double") / col("n_g").cast("double")
    grouped.crossJoin(broadcast(pooled))
      .select(col("grp"), col("n_g"),
        round(meanXg, 9).as("mean_pre"),
        round(meanYg, 9).as("mean_post"),
        round(theta, 9).as("theta"),
        round(meanYg - theta * (meanXg - meanXPool), 9).as("adjusted_mean"))
  }

  val q131Oracle: String =
    """WITH o AS (SELECT o_custkey, year(o_orderdate) AS yr,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |per AS (SELECT o_custkey,
      |    CAST(SUM(CASE WHEN yr < 1996 THEN cents ELSE 0 END) AS HUGEINT) AS x,
      |    CAST(SUM(CASE WHEN yr >= 1996 THEN cents ELSE 0 END) AS HUGEINT) AS y
      |  FROM o GROUP BY 1),
      |pooled AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
      |  FROM per),
      |grouped AS (SELECT o_custkey % 2 AS grp,
      |    CAST(COUNT(*) AS BIGINT) AS n_g,
      |    SUM(x) AS sxg, SUM(y) AS syg
      |  FROM per GROUP BY 1)
      |SELECT grp, n_g,
      |  ROUND(CAST(sxg AS DOUBLE) / CAST(n_g AS DOUBLE), 9) AS mean_pre,
      |  ROUND(CAST(syg AS DOUBLE) / CAST(n_g AS DOUBLE), 9) AS mean_post,
      |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
      |        CAST(n * sxx - sx * sx AS DOUBLE), 9) AS theta,
      |  ROUND(CAST(syg AS DOUBLE) / CAST(n_g AS DOUBLE) -
      |    (CAST(n * sxy - sx * sy AS DOUBLE) /
      |     CAST(n * sxx - sx * sx AS DOUBLE)) *
      |    (CAST(sxg AS DOUBLE) / CAST(n_g AS DOUBLE) -
      |     CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS adjusted_mean
      |FROM grouped CROSS JOIN pooled""".stripMargin

  val queries: Map[String, Q] = Map(
    "q131_cuped" -> q131Cuped,
    "q106_gini" -> q106Gini,
    "q113_avg_precision" -> q113AvgPrecision,
    "q107_lift" -> q107Lift,
    "q108_welch" -> q108Welch,
    "q109_calibration" -> q109Calibration)

  val oracleSql: Map[String, String] = Map(
    "q131_cuped" -> q131Oracle,
    "q106_gini" -> q106Oracle,
    "q113_avg_precision" -> q113Oracle,
    "q107_lift" -> q107Oracle,
    "q108_welch" -> q108Oracle,
    "q109_calibration" -> q109Oracle)
}

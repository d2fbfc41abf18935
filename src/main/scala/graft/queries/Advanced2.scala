package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranking
import graft.sources.TableCatalog._

/** Round-12 additions: market-basket association rules, triangle
  * counting, referential-integrity auditing, inter-order gap stats,
  * month-over-month deltas, linear-interpolation gap fill, Zipf
  * audit, rank movers, and embedding class-scatter diagnostics.
  * SURVEY.md §2 rows 108-116.
  *
  * Same oracle-parity discipline as [[Relational]]/[[Advanced]]:
  * exact integer / DECIMAL statistics everywhere, doubles only in a
  * final fixed IEEE formula shared verbatim with the DuckDB oracle,
  * deterministic tie-breaks on every top-k.
  */
object Advanced2 {

  type Q = (SparkSession, String) => DataFrame

  /** Distinct (order, part) incidence — the basket table under q97/q98.
    * One dedup shuffle on the order key; pair generation afterwards is
    * a co-partitioned self-join within the order, so candidate volume
    * is Σ|basket|² (baskets are small by nature — the blow-up knob is
    * basket size, never corpus size).
    */
  private def baskets(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(col("l_orderkey").as("ok"),
      col("l_partkey").as("pk")).distinct()

  // ---- q97: market-basket association rules — parts bought together
  //      in one order, with support/confidence/lift. Counts are exact
  //      integers; the three ratios are each ONE double division of
  //      exact bigint products (all < 2^53 — the q71 convention),
  //      rounded to 9. Top-20 by (n_ab desc, pa, pb) deterministic. ----
  val q97BasketPairs: Q = (s, d) => {
    val li = baskets(s, d).localCheckpoint(true) // 3 consumers below
    val nOrders = li.agg(countDistinct(col("ok")).cast("bigint").as("n_orders"))
    val partCnt = li.groupBy(col("pk"))
      .agg(count(lit(1)).cast("bigint").as("n_ord"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).cast("bigint").as("n_ab"))
    pairs
      .join(partCnt.select(col("pk").as("pa"), col("n_ord").as("n_a")), "pa")
      .join(partCnt.select(col("pk").as("pb"), col("n_ord").as("n_b")), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("n_ab"),
        round(col("n_ab").cast("double") / col("n_orders"), 9).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 9).as("confidence"),
        round((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")), 9).as("lift"))
      .orderBy(col("n_ab").desc, col("pa"), col("pb"))
      .limit(20)
  }

  val q97Oracle: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
      |pc AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_ord FROM li GROUP BY pk),
      |pr AS (SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
      |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2)
      |SELECT pr.pa, pr.pb, pr.n_ab,
      |  ROUND(CAST(pr.n_ab AS DOUBLE) / n.n_orders, 9) AS support,
      |  ROUND(CAST(pr.n_ab AS DOUBLE) / ca.n_ord, 9) AS confidence,
      |  ROUND(CAST(pr.n_ab * n.n_orders AS DOUBLE) / (ca.n_ord * cb.n_ord), 9) AS lift
      |FROM pr, n
      |JOIN pc ca ON ca.pk = pr.pa
      |JOIN pc cb ON cb.pk = pr.pb
      |ORDER BY pr.n_ab DESC, pr.pa, pr.pb LIMIT 20""".stripMargin

  // ---- q98: triangle counting on the co-purchase graph (edges =
  //      part pairs co-occurring in ≥2 orders). Degree-ordered edge
  //      orientation (Schank-Wagner/cohen): every edge points from
  //      the smaller (degree, id) endpoint, so out-degrees are
  //      O(√|E|)-bounded and wedge volume is Σ outdeg² — never the
  //      hub-quadratic Σ deg² a naive wedge join pays on skewed
  //      graphs. Each triangle is counted exactly once (at its
  //      order-minimal vertex). The oracle is the independent
  //      unoriented a<b<c three-way join. ----
  val q98Triangles: Q = (s, d) => {
    val li = baskets(s, d)
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("x"), col("b.pk").as("y"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("x"), col("y"))
    graft.operators.GraphOps.triangleCount(edges, "x", "y")
  }

  val q98Oracle: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |pr AS (SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n
      |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
      |e AS (SELECT pa AS a, pb AS b FROM pr WHERE n >= 2)
      |SELECT
      |  CAST((SELECT COUNT(*) FROM (SELECT a AS x FROM e UNION SELECT b FROM e) t) AS BIGINT) AS n_nodes,
      |  CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
      |  CAST((SELECT COUNT(*) FROM e e1
      |        JOIN e e2 ON e2.a = e1.b
      |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT) AS n_triangles""".stripMargin

  // ---- q99: referential-integrity audit — orphan foreign keys across
  //      the star schema, one report row per FK edge. Each edge is ONE
  //      left join of the child scan against the parent's distinct
  //      keys + one aggregation (orphans = non-null FK with no parent;
  //      SQL convention: NULL FKs are not violations, reported
  //      separately). The governance rollup a CDC sink runs after
  //      apply. ----
  val q99ReferentialIntegrity: Q = (s, d) => {
    def audit(name: String, child: DataFrame, fk: String,
              parent: DataFrame, pk: String): DataFrame = {
      val keys = parent.select(col(pk).as("__pk")).distinct()
      child.select(col(fk).as("__fk"))
        .join(keys, col("__fk") === col("__pk"), "left")
        .agg(lit(name).as("fk"),
          count(lit(1)).cast("bigint").as("n_rows"),
          sum(when(col("__fk").isNull, 1L).otherwise(0L)).cast("bigint")
            .as("n_nulls"),
          sum(when(col("__fk").isNotNull && col("__pk").isNull, 1L)
            .otherwise(0L)).cast("bigint").as("n_orphans"))
    }
    audit("lineitem.l_orderkey->orders", lineitem(s, d), "l_orderkey",
        orders(s, d), "o_orderkey")
      .unionAll(audit("lineitem.l_partkey->part", lineitem(s, d), "l_partkey",
        part(s, d), "p_partkey"))
      .unionAll(audit("lineitem.l_suppkey->supplier", lineitem(s, d),
        "l_suppkey", supplier(s, d), "s_suppkey"))
      .unionAll(audit("orders.o_custkey->customer", orders(s, d), "o_custkey",
        customer(s, d), "c_custkey"))
      .unionAll(audit("customer.c_nationkey->nation", customer(s, d),
        "c_nationkey", nation(s, d), "n_nationkey"))
  }

  val q99Oracle: String =
    """SELECT 'lineitem.l_orderkey->orders' AS fk,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  CAST(SUM(CASE WHEN l.l_orderkey IS NOT NULL AND p.k IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      |FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey AS k FROM orders) p
      |  ON p.k = l.l_orderkey
      |UNION ALL
      |SELECT 'lineitem.l_partkey->part',
      |  CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN l.l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(SUM(CASE WHEN l.l_partkey IS NOT NULL AND p.k IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem l LEFT JOIN (SELECT DISTINCT p_partkey AS k FROM part) p
      |  ON p.k = l.l_partkey
      |UNION ALL
      |SELECT 'lineitem.l_suppkey->supplier',
      |  CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN l.l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(SUM(CASE WHEN l.l_suppkey IS NOT NULL AND p.k IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem l LEFT JOIN (SELECT DISTINCT s_suppkey AS k FROM supplier) p
      |  ON p.k = l.l_suppkey
      |UNION ALL
      |SELECT 'orders.o_custkey->customer',
      |  CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(SUM(CASE WHEN o.o_custkey IS NOT NULL AND p.k IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT)
      |FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey AS k FROM customer) p
      |  ON p.k = o.o_custkey
      |UNION ALL
      |SELECT 'customer.c_nationkey->nation',
      |  CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN c.c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(SUM(CASE WHEN c.c_nationkey IS NOT NULL AND p.k IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT)
      |FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey AS k FROM nation) p
      |  ON p.k = c.c_nationkey""".stripMargin

  // ---- q100: inter-order gap statistics — per-customer days between
  //      consecutive orders (the reorder-cadence / churn-risk shape).
  //      One window per customer (bounded state, deterministic
  //      (date, orderkey) order), exact integer day gaps, discrete
  //      median via percentile_disc (the q68 parity — actual data
  //      values, no interpolation). Customers with ≥3 orders. ----
  val q100ReorderGaps: Q = (s, d) => {
    val o = orders(s, d).select(col("o_custkey"),
      to_date(col("o_orderdate")).as("day"), col("o_orderkey"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val gaps = o.withColumn("__gap",
        datediff(col("day"), lag(col("day"), 1).over(w)).cast("long"))
      .filter(col("__gap").isNotNull)
    gaps.groupBy(col("o_custkey"))
      .agg((count(lit(1)) + 1).cast("bigint").as("n_orders"),
        min(col("__gap")).as("min_gap"),
        max(col("__gap")).as("max_gap"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __gap)")
          .cast("bigint").as("median_gap"))
      .filter(col("n_orders") >= 3)
  }

  val q100Oracle: String =
    """WITH g AS (
      |  SELECT o_custkey,
      |    date_diff('day',
      |      lag(CAST(o_orderdate AS DATE)) OVER
      |        (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
      |      CAST(o_orderdate AS DATE)) AS gap
      |  FROM orders)
      |SELECT o_custkey,
      |  CAST(COUNT(*) + 1 AS BIGINT) AS n_orders,
      |  CAST(MIN(gap) AS BIGINT) AS min_gap,
      |  CAST(MAX(gap) AS BIGINT) AS max_gap,
      |  CAST(quantile_disc(gap, 0.5) AS BIGINT) AS median_gap
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY o_custkey HAVING COUNT(*) + 1 >= 3""".stripMargin

  // ---- q101: month-over-month revenue change per nation — the
  //      reporting delta shape. Monthly cents are exact decimal sums;
  //      the pct change is ONE double division of exact cents (both
  //      < 2^53), rounded to 9; prev month = previous OBSERVED month
  //      (lag over the per-nation month series, deterministic). ----
  val q101MomChange: Q = (s, d) => {
    val rev = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long").as("rev_cents"))
    val w = Window.partitionBy(col("nation")).orderBy(col("month"))
    rev.withColumn("prev_cents", lag(col("rev_cents"), 1).over(w))
      .withColumn("delta_cents", col("rev_cents") - col("prev_cents"))
      .withColumn("pct_change",
        round(col("delta_cents").cast("double") / col("prev_cents"), 9))
  }

  val q101Oracle: String =
    """WITH rev AS (
      |  SELECT n.n_name AS nation,
      |    CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
      |    CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2)
      |SELECT nation, month, rev_cents,
      |  lag(rev_cents) OVER (PARTITION BY nation ORDER BY month) AS prev_cents,
      |  rev_cents - lag(rev_cents) OVER (PARTITION BY nation ORDER BY month) AS delta_cents,
      |  ROUND(CAST(rev_cents - lag(rev_cents) OVER (PARTITION BY nation ORDER BY month) AS DOUBLE)
      |    / lag(rev_cents) OVER (PARTITION BY nation ORDER BY month), 9) AS pct_change
      |FROM rev""".stripMargin

  // ---- q102: LINEAR-interpolation gap fill — the lerp complement of
  //      q35's LOCF: a missing day between two observations gets the
  //      straight-line value, EXACT by integer floor arithmetic:
  //      lerp = prev + (Δ·offset − pmod(Δ·offset, span)) / span, every
  //      term a bigint (Δ·offset < 2^40), the floor-mod spelled
  //      identically in both engines so a negative Δ cannot split
  //      truncate-vs-floor. Grid = per-user min..max day (sequence +
  //      explode in the scan task, no driver date loop); prev/next
  //      carried by two IGNORE-NULLS windows per user (bounded
  //      state). ----
  val q102LerpFill: Q = (s, d) => {
    val daily = events(s, d).filter(col("user_id") < 50)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100)
        .cast("long").as("cents"))
    graft.operators.Interpolate.lerpFill(daily, "user_id", "day", "cents")
  }

  val q102Oracle: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events WHERE user_id < 50 GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, CAST(unnest(generate_series(MIN(day), MAX(day),
      |    INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM daily GROUP BY user_id),
      |j AS (SELECT g.user_id, g.day, d.cents
      |      FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day),
      |ends AS (
      |  SELECT user_id, day, cents,
      |    LAST_VALUE(cents IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY day
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    LAST_VALUE(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY day
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
      |    FIRST_VALUE(cents IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY day
      |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY day
      |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      |  FROM j)
      |SELECT user_id, day,
      |  COALESCE(cents,
      |    pv + ((nv - pv) * date_diff('day', pd, day)
      |          - (((nv - pv) * date_diff('day', pd, day)) % date_diff('day', pd, nd)
      |             + date_diff('day', pd, nd)) % date_diff('day', pd, nd))
      |       // date_diff('day', pd, nd)) AS cents,
      |  cents IS NULL AS interpolated
      |FROM ends""".stripMargin

  // ---- text_zipf: Zipf-law audit of the token distribution — for the
  //      top-100 token types (rank by count desc, token asc —
  //      deterministic), the rank·count constancy product and exact
  //      integer ppm share (the slope/log fit is left to the analyst:
  //      ln() ulps differ across engines — the q85 Benford rule). The
  //      count table is vocabulary-sized after map-side combine; the
  //      top-100 is a TakeOrdered and the walk is driver-side over 100
  //      rows (the q54/q96 model-sized-collect convention). ----
  val textZipf: Q = (s, d) => {
    import graft.functions.wsTokens
    val cnt = documents(s, d)
      .select(explode(wsTokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("bigint").as("n"))
      .localCheckpoint(true) // total + top-100 both read it
    val total = cnt.agg(sum(col("n"))).collect()(0).getLong(0)
    val top = cnt.orderBy(col("n").desc, col("w")).limit(100).collect()
    import s.implicits._
    top.zipWithIndex.map { case (r, i) =>
      val n = r.getLong(1)
      (i + 1L, r.getString(0), n, (i + 1L) * n, n * 1000000L / total)
    }.toSeq.toDF("rank", "token", "n", "rank_x_count", "share_ppm")
  }

  val textZipfOracle: String =
    """WITH c AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |        FROM documents)
      |  GROUP BY w),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
      |r AS (SELECT w, n, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, w) AS BIGINT) AS rank
      |      FROM c)
      |SELECT r.rank, r.w AS token, r.n, r.rank * r.n AS rank_x_count,
      |  r.n * 1000000 // t.total AS share_ppm
      |FROM r, t WHERE r.rank <= 100""".stripMargin

  // ---- q103: rank movers — each part's revenue rank in the early vs
  //      late half of the shipping window, biggest rank changes first.
  //      Both ranks come from the distributed Ranking operator (range
  //      partitions + driver offsets — never an unpartitioned
  //      ROW_NUMBER window) over a composite integer key encoding
  //      (revenue desc, partkey asc); revenue is an exact decimal sum
  //      scaled to integer 1/10000ths so the key is collision-free.
  //      Top-20 by (|Δrank| desc, partkey). ----
  val q103RankMovers: Q = (s, d) => {
    val li = lineitem(s, d).select(col("l_partkey"),
      to_date(col("l_shipdate")).as("sd"),
      (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .as("rev"))
    val mm = li.agg(min(col("sd")).as("lo"), max(col("sd")).as("hi"))
      .select(date_add(col("lo"),
        (datediff(col("hi"), col("lo")) / 2).cast("int")).as("mid"))
    val withHalf = li.crossJoin(broadcast(mm))
      .withColumn("half", when(col("sd") < col("mid"), 1).otherwise(2))
    def ranked(half: Int, out: String) = {
      val rev = withHalf.filter(col("half") === half)
        .groupBy(col("l_partkey"))
        .agg((sum(col("rev")) * 10000).cast("long").as("rev4"))
        .withColumn("__key", -col("rev4") * 10000000L + col("l_partkey"))
      Ranking.globalRank(rev, "__key", out)
        .select(col("l_partkey"), col(out))
    }
    ranked(1, "rank_early").join(ranked(2, "rank_late"), "l_partkey")
      .withColumn("rank_change", col("rank_late") - col("rank_early"))
      .withColumn("abs_change", abs(col("rank_change")))
      .orderBy(col("abs_change").desc, col("l_partkey"))
      .limit(20)
      .select(col("l_partkey"), col("rank_early"), col("rank_late"),
        col("rank_change"))
  }

  val q103Oracle: String =
    """WITH li AS (
      |  SELECT l_partkey, CAST(l_shipdate AS DATE) AS sd,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS rev
      |  FROM lineitem),
      |mm AS (SELECT MIN(sd) + CAST(date_diff('day', MIN(sd), MAX(sd)) // 2 AS INTEGER) AS mid FROM li),
      |e AS (SELECT l_partkey, CAST(SUM(rev) * 10000 AS BIGINT) AS rev4
      |      FROM li, mm WHERE sd < mid GROUP BY 1),
      |l AS (SELECT l_partkey, CAST(SUM(rev) * 10000 AS BIGINT) AS rev4
      |      FROM li, mm WHERE sd >= mid GROUP BY 1),
      |re AS (SELECT l_partkey, CAST(ROW_NUMBER() OVER (ORDER BY rev4 DESC, l_partkey) AS BIGINT) AS rank_early FROM e),
      |rl AS (SELECT l_partkey, CAST(ROW_NUMBER() OVER (ORDER BY rev4 DESC, l_partkey) AS BIGINT) AS rank_late FROM l)
      |SELECT re.l_partkey, re.rank_early, rl.rank_late,
      |  rl.rank_late - re.rank_early AS rank_change
      |FROM re JOIN rl ON re.l_partkey = rl.l_partkey
      |ORDER BY abs(rl.rank_late - re.rank_early) DESC, re.l_partkey
      |LIMIT 20""".stripMargin

  // ---- emb_class_scatter: within-class scatter of the embedding
  //      space per label — the compactness half of a Fisher-style
  //      class-separability diagnostic (drift in it flags embedding
  //      collapse or label contamination). Values are scaled to exact
  //      integer micro-units first (round(v·10⁶) — engine-identical
  //      on doubles); the per-position scatter numerator
  //      n·Σx² − (Σx)² is the q38 exact-integer identity, summed over
  //      positions in DECIMAL(38,0). One posexplode + one hash agg —
  //      the shuffle carries per-position partial sums, never
  //      vectors. ----
  val embClassScatter: Q = (s, d) => {
    val ex = embeddings(s, d).select(col("label"),
      posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("vi", round(col("v").cast("double") * 1000000L)
        .cast("long"))
    val perPos = ex.groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("vi")).as("s"),
        sum(col("vi") * col("vi")).as("ss"))
    perPos.select(col("label"), col("n"),
        (col("n").cast("decimal(18,0)") * col("ss").cast("decimal(19,0)") -
          col("s").cast("decimal(19,0)") * col("s").cast("decimal(19,0)"))
          .cast("decimal(38,0)").as("sc"))
      .groupBy(col("label"))
      .agg(max(col("n")).cast("bigint").as("n"),
        // STRING surface, not DECIMAL(38,0): wide decimals land as
        // decimal128 in the written parquet, which the driver's
        // comparator cannot canonicalize against DuckDB's result path
        // (r12 verdict). Integer decimals print identically in both
        // engines, so the string is the portable exact form.
        sum(col("sc")).cast("decimal(38,0)").cast("string")
          .as("scatter_num"))
  }

  val embClassScatterOracle: String =
    """WITH ex AS (
      |  SELECT label, unnest(embedding) AS v,
      |         unnest(range(len(embedding))) AS pos
      |  FROM embeddings),
      |vi AS (SELECT label, pos,
      |         CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS vi
      |       FROM ex),
      |pp AS (SELECT label, pos, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(vi) AS BIGINT) AS s,
      |         CAST(SUM(vi * vi) AS BIGINT) AS ss
      |       FROM vi GROUP BY 1, 2)
      |SELECT label, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(CAST(SUM(CAST(CAST(n AS DECIMAL(18,0)) * CAST(ss AS DECIMAL(19,0))
      |    - CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0)) AS DECIMAL(38,0)))
      |    AS DECIMAL(38,0)) AS VARCHAR) AS scatter_num
      |FROM pp GROUP BY label""".stripMargin

  // ---- q104: Damerau-Levenshtein fuzzy dedup of part names — the
  //      typo-tolerant (transposition-aware) complement of q78's
  //      Jaro-Winkler: same last-token blocking (|block|² bounded,
  //      hot blocks excluded by the same BETWEEN filter in engine and
  //      oracle), scored by the native codegen expression
  //      (plans.DamerauLevenshtein, TRUE DL — a transposed pair may
  //      be edited further). Distances are exact integers, so every
  //      output cell hash-matches; ASCII names keep DuckDB's
  //      byte-walk and our code-unit walk identical. ----
  val q104DamerauDedup: Q = (s, d) => {
    graft.plans.GraftFunctions.register(s)
    val names = part(s, d).select(col("p_name")).distinct()
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val ok = names.groupBy(col("blk"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").between(2, 1000)).select("blk")
    val blocked = names.join(ok, Seq("blk"))
    val a = blocked.select(col("blk"), col("p_name").as("na"))
    val b = blocked.select(col("blk"), col("p_name").as("nb"))
    a.join(b, Seq("blk")).filter(col("na") < col("nb"))
      .withColumn("dl",
        graft.plans.GraftFunctions.damerauFast(col("na"), col("nb"))
          .cast("bigint"))
      .filter(col("dl") <= 4)
      .select(col("na"), col("nb"), col("dl"))
  }

  val q104Oracle: String =
    """WITH n AS (SELECT DISTINCT p_name FROM part),
      |b AS (SELECT p_name, regexp_split_to_array(p_name, ' ')[-1] AS blk FROM n),
      |ok AS (SELECT blk FROM b GROUP BY blk HAVING COUNT(*) BETWEEN 2 AND 1000),
      |bb AS (SELECT b.p_name, b.blk FROM b JOIN ok USING (blk))
      |SELECT a.p_name AS na, c.p_name AS nb,
      |  CAST(damerau_levenshtein(a.p_name, c.p_name) AS BIGINT) AS dl
      |FROM bb a JOIN bb c ON a.blk = c.blk AND a.p_name < c.p_name
      |WHERE damerau_levenshtein(a.p_name, c.p_name) <= 4""".stripMargin

  // ---- graph_kcore: 3-core of the co-purchase graph (edges = part
  //      pairs sharing ≥2 orders) — the density backbone the triangle
  //      count (q98) summarizes. Unique fixpoint ⇒ deterministic
  //      rows; rows-only under the driver (iterate-until-fixpoint
  //      peeling has no recursive-CTE oracle form), fixpoint and
  //      peeling order-independence pinned by crafted specs. ----
  val graphKcore: Q = (s, d) => {
    val li = baskets(s, d)
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("x"), col("b.pk").as("y"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("x"), col("y"))
    graft.operators.GraphOps.kCore(edges, "x", "y", k = 3)
  }

  // ---- graph_communities (rows-only — iterate-until-fixpoint has no
  //      recursive-CTE oracle form, the graph_kcore convention):
  //      deterministic label-propagation communities of the same
  //      co-purchase graph, censused to the top-20 communities by
  //      (size desc, community asc). The LPA fixpoint is a pure
  //      function of the graph (synchronous rounds, min-label ties),
  //      so the census is bit-deterministic under any partitioning
  //      (spec-asserted). ----
  val graphCommunities: Q = (s, d) => {
    val li = baskets(s, d)
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("x"), col("b.pk").as("y"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("x"), col("y"))
    graft.operators.GraphOps.labelPropagation(edges, "x", "y")
      .groupBy(col("community"))
      .agg(count(lit(1)).cast("bigint").as("n_members"),
        min(col("node")).cast("bigint").as("min_node"),
        max(col("node")).cast("bigint").as("max_node"))
      .orderBy(col("n_members").desc, col("community"))
      .limit(20)
  }

  // ---- graph_communities2 (rows-only — iterate-until-fixpoint has
  //      no recursive-CTE oracle form): modularity-guided Louvain
  //      communities of the same co-purchase graph, censused like
  //      graph_communities. Unlike LPA (which floods dense graphs to
  //      one label per component — the pinned epidemic mode), the
  //      local-move refinement is graded by exact modularity and
  //      keeps structure on hairballs (spec: Q(louvain) > Q(LPA) = 0
  //      there). Bit-deterministic: synchronous phase-1 rounds
  //      accepted only on strict exact-Q increase, sequential phase-2
  //      in ascending-label order, min-label ties everywhere. ----
  val graphCommunities2: Q = (s, d) => {
    val li = baskets(s, d)
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("x"), col("b.pk").as("y"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("x"), col("y"))
    // maxIter 200: phase-1 synchronous rounds grow slowly with graph
    // size (measured: the 1.2M-edge 10x corpus converges in 51-200
    // rounds, ~7 s local CSR; the sf0.1 graph well under 50)
    graft.operators.GraphOps.louvain(edges, "x", "y", maxIter = 200)
      .groupBy(col("community"))
      .agg(count(lit(1)).cast("bigint").as("n_members"),
        min(col("node")).cast("bigint").as("min_node"),
        max(col("node")).cast("bigint").as("max_node"))
      .orderBy(col("n_members").desc, col("community"))
      .limit(20)
  }

  // ---- q136: Newman modularity of the brand partition over the
  //      co-purchase graph — the community-QUALITY metric completing
  //      LPA's community-ASSIGNMENT (score any labeling against the
  //      graph; here the brand column gives a deterministic,
  //      oracle-replicable assignment). Per-community contribution
  //      (4·m·e_c − d_c²)/4m² in exact integers (DECIMAL(38,0)
  //      numerator — d_c² brushes bigint at m≈1e9) with ONE double
  //      division rounded to 9. ----
  val q136Modularity: Q = (s, d) => {
    val li = baskets(s, d)
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("x"), col("b.pk").as("y"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("x"), col("y"))
    val assign = part(s, d).select(col("p_partkey").as("node"),
      col("p_brand").as("community"))
    graft.operators.GraphOps.modularity(edges, "x", "y",
        assign, "node", "community")
      .orderBy(col("community"))
  }

  val q136Oracle: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e AS (SELECT a.pk AS x, b2.pk AS y FROM b a JOIN b b2
      |        ON a.ok = b2.ok AND a.pk < b2.pk
      |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |deg AS (SELECT node, COUNT(*) AS deg FROM
      |          (SELECT x AS node FROM e UNION ALL SELECT y AS node FROM e)
      |        GROUP BY 1),
      |m AS (SELECT COUNT(*) AS m FROM e),
      |asg AS (SELECT p_partkey AS node, p_brand AS community FROM part),
      |dc AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |         CAST(SUM(COALESCE(deg, 0)) AS BIGINT) AS deg_sum
      |       FROM asg LEFT JOIN deg USING (node) GROUP BY 1),
      |ec AS (SELECT a1.community, CAST(COUNT(*) AS BIGINT) AS e_in
      |       FROM e JOIN asg a1 ON e.x = a1.node JOIN asg a2 ON e.y = a2.node
      |       WHERE a1.community = a2.community GROUP BY 1)
      |SELECT community, n_nodes,
      |  CAST(COALESCE(e_in, 0) AS BIGINT) AS e_in, deg_sum,
      |  round(CAST(4 * m.m * COALESCE(e_in, 0) - deg_sum * deg_sum AS DOUBLE)
      |    / CAST(4 * m.m * m.m AS DOUBLE), 9) AS q_contrib
      |FROM dc LEFT JOIN ec USING (community) CROSS JOIN m
      |ORDER BY community""".stripMargin

  // ---- q147: conductance of the brand partition over the
  //      co-purchase graph — the cut-quality companion to q136's
  //      modularity on the same assignment (modularity rewards
  //      internal density, conductance punishes external leakage):
  //      φ(c) = cut(c)/min(vol(c), vol(rest)), exact integers, ONE
  //      double division rounded 9. ----
  val q147Conductance: Q = (s, d) => {
    val li = baskets(s, d)
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("x"), col("b.pk").as("y"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("x"), col("y"))
    val assign = part(s, d).select(col("p_partkey").as("node"),
      col("p_brand").as("community"))
    graft.operators.GraphOps.conductance(edges, "x", "y",
        assign, "node", "community")
      .orderBy(col("community"))
  }

  val q147Oracle: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e AS (SELECT a.pk AS x, b2.pk AS y FROM b a JOIN b b2
      |        ON a.ok = b2.ok AND a.pk < b2.pk
      |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |deg AS (SELECT node, COUNT(*) AS deg FROM
      |          (SELECT x AS node FROM e UNION ALL SELECT y AS node FROM e)
      |        GROUP BY 1),
      |vol AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS vol_all FROM e),
      |asg AS (SELECT p_partkey AS node, p_brand AS community FROM part),
      |dc AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |         CAST(SUM(COALESCE(deg, 0)) AS BIGINT) AS deg_sum
      |       FROM asg LEFT JOIN deg USING (node) GROUP BY 1),
      |cut AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS cut_edges FROM (
      |          SELECT a1.community FROM e
      |            JOIN asg a1 ON e.x = a1.node JOIN asg a2 ON e.y = a2.node
      |            WHERE a1.community <> a2.community
      |          UNION ALL
      |          SELECT a2.community FROM e
      |            JOIN asg a1 ON e.x = a1.node JOIN asg a2 ON e.y = a2.node
      |            WHERE a1.community <> a2.community)
      |        GROUP BY 1)
      |SELECT dc.community, n_nodes,
      |  CAST(COALESCE(cut_edges, 0) AS BIGINT) AS cut_edges, deg_sum,
      |  CASE WHEN deg_sum > 0 AND vol_all - deg_sum > 0 THEN
      |    round(CAST(COALESCE(cut_edges, 0) AS DOUBLE)
      |      / CAST(least(deg_sum, vol_all - deg_sum) AS DOUBLE), 9)
      |  ELSE NULL END AS conductance
      |FROM dc LEFT JOIN cut USING (community) CROSS JOIN vol
      |ORDER BY dc.community""".stripMargin

  // ---- q105: EXACT ROC AUC via the Mann-Whitney rank-sum — the
  //      model-evaluation primitive at corpus scale (here scoring
  //      "is this doc English" by n_chars — any score column slots
  //      in). Aggregate to the per-VALUE (pos, neg) table first
  //      (value-cardinality, the q93 discipline), cumulate negatives
  //      below each value with the distributed PrefixSum (never a
  //      single-task window), then 2U = Σ [2·pos·negBelow + pos·neg]
  //      handles ties by midrank EXACTLY in integers; AUC is the one
  //      double division, rounded to 9. ----
  val q105Auc: Q = (s, d) => {
    import graft.operators.PrefixSum
    val scored = documents(s, d).select(
      col("n_chars").cast("long").as("score"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    val perValue = scored.groupBy(col("score"))
      .agg(sum(col("pos")).as("p_at"),
        sum(lit(1L) - col("pos")).as("n_at"))
    val cum = PrefixSum.runningTotal(perValue, "score", "n_at", "n_cum")
      .withColumn("n_below", col("n_cum") - col("n_at"))
    val twoU = cum.agg(
      sum(col("p_at") * col("n_below") * 2 + col("p_at") * col("n_at"))
        .cast("decimal(38,0)").as("two_u"),
      sum(col("p_at")).cast("bigint").as("n_pos"),
      sum(col("n_at")).cast("bigint").as("n_neg"))
    twoU.select(col("two_u").cast("bigint").as("two_u"),
      col("n_pos"), col("n_neg"),
      round(col("two_u").cast("double") /
        (col("n_pos") * col("n_neg") * 2).cast("double"), 9).as("auc"))
  }

  val q105Oracle: String =
    """WITH s AS (SELECT CAST(n_chars AS BIGINT) AS score,
      |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |           FROM documents),
      |pv AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS p_at,
      |         CAST(SUM(1 - pos) AS BIGINT) AS n_at
      |       FROM s GROUP BY score),
      |c AS (SELECT score, p_at, n_at,
      |        CAST(SUM(n_at) OVER (ORDER BY score
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_at AS BIGINT) AS n_below
      |      FROM pv)
      |SELECT CAST(SUM(p_at * n_below * 2 + p_at * n_at) AS BIGINT) AS two_u,
      |  CAST(SUM(p_at) AS BIGINT) AS n_pos,
      |  CAST(SUM(n_at) AS BIGINT) AS n_neg,
      |  ROUND(CAST(SUM(p_at * n_below * 2 + p_at * n_at) AS DOUBLE) /
      |    CAST(SUM(p_at) * SUM(n_at) * 2 AS DOUBLE), 9) AS auc
      |FROM c""".stripMargin

  // ---- q110: grid-bucketed exact radius self-join — the spatial
  //      blocking shape (geo dedup, store-proximity, sensor
  //      clustering). Synthetic integer coordinates hash-scattered
  //      from the customer key (deterministic, engine-identical
  //      modular arithmetic); SpatialJoin buckets into r-sized cells
  //      so candidates are the 3×3-neighbourhood equi-join, never N²;
  //      the exact integer d² ≤ r² filter and id< dedup make the pair
  //      set exact. Output is the checksum row (counts + d² moments)
  //      — any wrong/missing pair moves it. ----
  val q110RadiusJoin: Q = (s, d) => {
    val pts = customer(s, d).select(col("c_custkey").as("id"),
      expr("(c_custkey * 2654435761L) % 100000").as("x"),
      expr("(c_custkey * 40503L + 12345) % 100000").as("y"))
    val pairs = graft.operators.SpatialJoin
      .radiusSelfJoin(pts, "id", "x", "y", r = 1000L)
      .localCheckpoint(true) // two consumers below
    val touched = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id")))
      .agg(countDistinct(col("id")).cast("bigint").as("n_points"))
    pairs.agg(count(lit(1)).cast("bigint").as("n_pairs"),
        sum(col("d2")).cast("bigint").as("sum_d2"),
        min(col("d2")).cast("bigint").as("min_d2"),
        max(col("d2")).cast("bigint").as("max_d2"))
      .crossJoin(broadcast(touched))
  }

  val q110Oracle: String =
    """WITH p AS (SELECT c_custkey AS id,
      |    (c_custkey * 2654435761) % 100000 AS x,
      |    (c_custkey * 40503 + 12345) % 100000 AS y
      |  FROM customer),
      |c AS (SELECT id, x, y, x // 1000 AS cx, y // 1000 AS cy FROM p),
      |n AS (SELECT id, x, y, cx + dx.d AS ncx, cy + dy.d AS ncy
      |  FROM c, (VALUES (-1), (0), (1)) dx(d), (VALUES (-1), (0), (1)) dy(d)),
      |pr AS (SELECT a.id AS ia, b.id AS ib,
      |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      |  FROM c a JOIN n b ON a.cx = b.ncx AND a.cy = b.ncy AND a.id < b.id
      |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 1000000),
      |t AS (SELECT CAST(COUNT(DISTINCT id) AS BIGINT) AS n_points
      |  FROM (SELECT ia AS id FROM pr UNION ALL SELECT ib FROM pr))
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(d2) AS BIGINT) AS sum_d2,
      |  CAST(MIN(d2) AS BIGINT) AS min_d2,
      |  CAST(MAX(d2) AS BIGINT) AS max_d2,
      |  (SELECT n_points FROM t) AS n_points
      |FROM pr""".stripMargin

  // ---- q111: per-node LOCAL clustering coefficient on the q98
  //      co-purchase graph — the per-node refinement of the global
  //      triangle count (community density around each part). Same
  //      degree-ordered oriented enumeration (Σ outdeg² wedge bound),
  //      each triangle incrementing all three corners; deg and T
  //      exact integers, lcc ONE double division rounded to 9. ----
  val q111ClusteringCoeff: Q = (s, d) => {
    val li = baskets(s, d)
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("x"), col("b.pk").as("y"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("x"), col("y"))
    graft.operators.GraphOps.localClustering(edges, "x", "y")
      .withColumnRenamed("node", "pk")
  }

  val q111Oracle: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |pr AS (SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n
      |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
      |e AS (SELECT pa AS a, pb AS b FROM pr WHERE n >= 2),
      |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
      |    (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
      |tr AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
      |       FROM e e1 JOIN e e2 ON e2.a = e1.b
      |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM
      |    (SELECT u AS node FROM tr UNION ALL SELECT v FROM tr
      |     UNION ALL SELECT w FROM tr) GROUP BY 1)
      |SELECT d.node AS pk, d.deg,
      |  CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
      |  CASE WHEN d.deg < 2 THEN 0.0
      |       ELSE ROUND(CAST(COALESCE(t.n_tri, 0) * 2 AS DOUBLE) /
      |                  CAST(d.deg * (d.deg - 1) AS DOUBLE), 9) END AS lcc
      |FROM deg d LEFT JOIN tn t ON t.node = d.node""".stripMargin

  // ---- q112: Mann-Kendall trend test — the NON-PARAMETRIC "is it
  //      trending" complement of q84's least-squares slope (no ln, no
  //      distributional assumption, outlier-immune). Per nation:
  //      monthly exact-cents revenue series, S = Σ_{i<j} sign(x_j−x_i)
  //      over month pairs — a co-partitioned WITHIN-NATION self-join
  //      whose pair volume is months², bounded by the calendar, never
  //      by corpus size. S and the pair count exact integers; tau-a =
  //      S/(n(n−1)/2) is the one double division, rounded to 9. ----
  val q112MannKendall: Q = (s, d) => {
    val monthly = orders(s, d)
      .join(customer(s, d).select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").as("nationkey")), "o_custkey")
      .groupBy(col("nationkey"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).as("rev"))
    val m = monthly.localCheckpoint(true) // pair join + month counts
    val pairs = m.as("a").join(m.as("b"),
        col("a.nationkey") === col("b.nationkey") && col("a.ym") < col("b.ym"))
      .select(col("a.nationkey").as("nationkey"),
        when(col("b.rev") > col("a.rev"), 1L)
          .when(col("b.rev") < col("a.rev"), -1L).otherwise(0L).as("sgn"))
    val stats = pairs.groupBy(col("nationkey"))
      .agg(sum(col("sgn")).cast("bigint").as("s_stat"),
        count(lit(1)).cast("bigint").as("n_pairs"))
    val nMonths = m.groupBy(col("nationkey"))
      .agg(count(lit(1)).cast("bigint").as("n_months"))
    stats.join(nMonths, "nationkey")
      .select(col("nationkey"), col("n_months"), col("s_stat"),
        round(col("s_stat").cast("double") / col("n_pairs"), 9).as("tau"))
  }

  val q112Oracle: String =
    """WITH monthly AS (SELECT c.c_nationkey AS nationkey,
      |    YEAR(o.o_orderdate) * 100 + MONTH(o.o_orderdate) AS ym,
      |    CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2),
      |pairs AS (SELECT a.nationkey,
      |    CASE WHEN b.rev > a.rev THEN 1 WHEN b.rev < a.rev THEN -1
      |         ELSE 0 END AS sgn
      |  FROM monthly a JOIN monthly b
      |    ON a.nationkey = b.nationkey AND a.ym < b.ym),
      |st AS (SELECT nationkey, CAST(SUM(sgn) AS BIGINT) AS s_stat,
      |    CAST(COUNT(*) AS BIGINT) AS n_pairs
      |  FROM pairs GROUP BY 1),
      |nm AS (SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n_months
      |  FROM monthly GROUP BY 1)
      |SELECT s.nationkey, n.n_months, s.s_stat,
      |  ROUND(CAST(s.s_stat AS DOUBLE) / s.n_pairs, 9) AS tau
      |FROM st s JOIN nm n ON n.nationkey = s.nationkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q97_basket_pairs" -> q97BasketPairs,
    "q98_triangles" -> q98Triangles,
    "q99_referential_integrity" -> q99ReferentialIntegrity,
    "q100_reorder_gaps" -> q100ReorderGaps,
    "q101_mom_change" -> q101MomChange,
    "q102_lerp_fill" -> q102LerpFill,
    "q103_rank_movers" -> q103RankMovers,
    "q104_damerau_dedup" -> q104DamerauDedup,
    "q105_auc" -> q105Auc,
    "q110_radius_join" -> q110RadiusJoin,
    "q111_clustering_coeff" -> q111ClusteringCoeff,
    "q112_mann_kendall" -> q112MannKendall,
    "graph_kcore" -> graphKcore,
    "graph_communities" -> graphCommunities,
    "graph_communities2" -> graphCommunities2,
    "q136_modularity" -> q136Modularity,
    "q147_conductance" -> q147Conductance,
    "text_zipf" -> textZipf,
    "emb_class_scatter" -> embClassScatter)

  val oracles: Map[String, String] = Map(
    "q97_basket_pairs" -> q97Oracle,
    "q98_triangles" -> q98Oracle,
    "q99_referential_integrity" -> q99Oracle,
    "q100_reorder_gaps" -> q100Oracle,
    "q101_mom_change" -> q101Oracle,
    "q102_lerp_fill" -> q102Oracle,
    "q103_rank_movers" -> q103Oracle,
    "q104_damerau_dedup" -> q104Oracle,
    "q105_auc" -> q105Oracle,
    "q110_radius_join" -> q110Oracle,
    "q111_clustering_coeff" -> q111Oracle,
    "q112_mann_kendall" -> q112Oracle,
    "text_zipf" -> textZipfOracle,
    "emb_class_scatter" -> embClassScatterOracle,
    "q136_modularity" -> q136Oracle,
    "q147_conductance" -> q147Oracle)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.Gram

/** Grouped MULTIVARIATE ORDINARY LEAST SQUARES — the classical
  * analytics step above q71/q84's single-covariate slope: fit
  * y = b0 + b1·x1 + … + bd·xd per group from ONE aggregation pass,
  * never materializing a design matrix. Two paths, two contracts:
  *
  *  - [[fitGrouped2]]: the ORACLE-EXACT two-covariate form. The
  *    normal equations (X'X)β = X'y with intercept are a 3×3 system
  *    whose Cramer determinants are polynomial in the EXACT INTEGER
  *    moments (n, Σx, Σx², Σxy, …), so every coefficient is ONE
  *    double division of two exact integers (rounded 6) and R² is
  *    ONE shared-SQL-text formula — bit-identical across engines.
  *    Exactness costs magnitude: the determinant algebra needs
  *    6·M²·max(M, My) < 10³⁸ (M = largest X'X entry, My = largest
  *    X'y entry), a NAMED per-group refusal that in practice means
  *    ~10⁹ rows per group at integer covariate scales.
  *  - [[fitFromGram]]: the SCALE path for any covariate count — the
  *    mergeable [[graft.plans.Gram]] moment aggregate (one pass,
  *    model-sized state per group, elementwise-additive merge)
  *    followed by a model-sized DRIVER solve (Gaussian elimination
  *    with partial pivoting — the coxPh driver-Newton convention)
  *    with maxGroups and singularity REFUSALS. Double moments: the
  *    result is deterministic to ulps, not hash-exact — rows-only.
  *
  * X'X and X'y are exactly the Gram moment state over the vector
  * [1?, x…, y] — the covariance analog of the sketch family: a
  * 100 TB fit is one partial-aggregate shuffle of ~(d+2)²/2 doubles
  * per group, never a second scan.
  */
object Ols {

  /** 3×3 Cramer determinants over the exact integer moment columns
    * (n, sx1, sx2, sx1x1, sx2x2, sx1x2, sy, sx1y, sx2y) — cofactor
    * expansions written ONCE and shared verbatim with the DuckDB
    * oracle (integer algebra: exact in DECIMAL(38,0) and HUGEINT
    * alike under the magnitude refusal).
    */
  val detSql: String =
    "n * (sx1x1 * sx2x2 - sx1x2 * sx1x2) " +
      "- sx1 * (sx1 * sx2x2 - sx1x2 * sx2) " +
      "+ sx2 * (sx1 * sx1x2 - sx1x1 * sx2)"

  val d0Sql: String =
    "sy * (sx1x1 * sx2x2 - sx1x2 * sx1x2) " +
      "- sx1 * (sx1y * sx2x2 - sx1x2 * sx2y) " +
      "+ sx2 * (sx1y * sx1x2 - sx1x1 * sx2y)"

  val d1Sql: String =
    "n * (sx1y * sx2x2 - sx1x2 * sx2y) " +
      "- sy * (sx1 * sx2x2 - sx1x2 * sx2) " +
      "+ sx2 * (sx1 * sx2y - sx1y * sx2)"

  val d2Sql: String =
    "n * (sx1x1 * sx2y - sx1y * sx1x2) " +
      "- sx1 * (sx1 * sx2y - sx1y * sx2) " +
      "+ sy * (sx1 * sx1x2 - sx1x1 * sx2)"

  /** Coefficient = det_i / det, ONE double division of two exact
    * integers, rounded 6; null on a singular system. Shared text.
    */
  def coefSql(d: String): String =
    s"CASE WHEN det <> 0 THEN " +
      s"round(CAST($d AS DOUBLE) / CAST(det AS DOUBLE), 6) ELSE NULL END"

  /** RIDGE variants of the Cramer texts (r17): the same cofactor
    * expansions with the penalized diagonal rx1x1 = sx1x1 + λ,
    * rx2x2 = sx2x2 + λ — the intercept row/column is NOT penalized
    * (the standard ridge convention). With integral λ the algebra
    * stays exact integer: at λ = 0 the texts reduce to the OLS
    * integers EXACTLY (decimal + 0 is an identity), so
    * [[ridgeGrouped2]](λ=0) equals [[fitGrouped2]] bit-for-bit.
    */
  val rdetSql: String =
    "n * (rx1x1 * rx2x2 - sx1x2 * sx1x2) " +
      "- sx1 * (sx1 * rx2x2 - sx1x2 * sx2) " +
      "+ sx2 * (sx1 * sx1x2 - rx1x1 * sx2)"

  val rd0Sql: String =
    "sy * (rx1x1 * rx2x2 - sx1x2 * sx1x2) " +
      "- sx1 * (sx1y * rx2x2 - sx1x2 * sx2y) " +
      "+ sx2 * (sx1y * sx1x2 - rx1x1 * sx2y)"

  val rd1Sql: String =
    "n * (sx1y * rx2x2 - sx1x2 * sx2y) " +
      "- sy * (sx1 * rx2x2 - sx1x2 * sx2) " +
      "+ sx2 * (sx1 * sx2y - sx1y * sx2)"

  val rd2Sql: String =
    "n * (rx1x1 * sx2y - sx1y * sx1x2) " +
      "- sx1 * (sx1 * sx2y - sx1y * sx2) " +
      "+ sy * (sx1 * sx1x2 - rx1x1 * sx2)"

  /** DIAGONAL COFACTORS of X'X — [(X'X)⁻¹]_ii · det, exact integers
    * (r16 inference upgrade): more Cramer algebra over the same
    * moments, covered by the same magnitude refusal (each ≤ 2·M²,
    * far inside the 6·M²·max(M,My) bound). c00 ↔ intercept,
    * c11 ↔ x1, c22 ↔ x2.
    */
  val c00Sql: String = "sx1x1 * sx2x2 - sx1x2 * sx1x2"
  val c11Sql: String = "n * sx2x2 - sx2 * sx2"
  val c22Sql: String = "n * sx1x1 - sx1 * sx1"

  /** SSE over the exact integers, in doubles — textually the inner
    * expression of [[r2Sql]] (identical parse ⇒ identical IEEE
    * evaluation ⇒ hash-identical across engines).
    */
  val sseSql: String =
    "(CAST(syy AS DOUBLE) - (CAST(d0 AS DOUBLE) * CAST(sy AS DOUBLE) " +
      "+ CAST(d1 AS DOUBLE) * CAST(sx1y AS DOUBLE) " +
      "+ CAST(d2 AS DOUBLE) * CAST(sx2y AS DOUBLE)) " +
      "/ CAST(det AS DOUBLE))"

  /** Standard error of coefficient i —
    * se_i = sqrt(σ̂²·[(X'X)⁻¹]_ii) = sqrt(max(SSE,0)/(n−3)·C_ii/det),
    * the ONE shared double formula rounded 6; null for a singular
    * system or n ≤ 3 (no residual dof). greatest(·,0) absorbs the
    * −ulp SSE of a numerically perfect fit.
    */
  def seSql(cii: String): String =
    s"CASE WHEN det <> 0 AND n > 3 THEN " +
      s"round(sqrt(greatest($sseSql, 0.0) / (CAST(n AS DOUBLE) - 3.0) " +
      s"* CAST($cii AS DOUBLE) / CAST(det AS DOUBLE)), 6) ELSE NULL END"

  /** t-statistic of coefficient i — the UNROUNDED β_i over the
    * UNROUNDED se (never a rounded-over-rounded chain), one shared
    * double formula rounded 6; null when SSE ≤ 0 (a perfect fit has
    * no finite t) or the se is undefined.
    */
  def tSql(d: String, cii: String): String =
    s"CASE WHEN det <> 0 AND n > 3 AND $sseSql > 0 THEN " +
      s"round((CAST($d AS DOUBLE) / CAST(det AS DOUBLE)) / " +
      s"sqrt($sseSql / (CAST(n AS DOUBLE) - 3.0) " +
      s"* CAST($cii AS DOUBLE) / CAST(det AS DOUBLE)), 6) ELSE NULL END"

  /** R² from exact integers: SSE = syy − β'X'y with β = det_i/det
    * folded in as doubles — ONE shared IEEE formula (identical parse
    * ⇒ identical evaluation order ⇒ hash-identical), rounded 6; null
    * on a singular system or zero total variance.
    */
  val r2Sql: String =
    "CASE WHEN det <> 0 AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) " +
      "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN " +
      "round(1.0 - (CAST(syy AS DOUBLE) " +
      "- (CAST(d0 AS DOUBLE) * CAST(sy AS DOUBLE) " +
      "+ CAST(d1 AS DOUBLE) * CAST(sx1y AS DOUBLE) " +
      "+ CAST(d2 AS DOUBLE) * CAST(sx2y AS DOUBLE)) " +
      "/ CAST(det AS DOUBLE)) " +
      "/ (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) " +
      "/ CAST(n AS DOUBLE)), 6) ELSE NULL END"

  /** Per-group two-covariate OLS with intercept, fully distributed
    * and ORACLE-EXACT. Inputs must be integral (pre-scale to cents /
    * whole units — the q84 discipline).
    *
    * Magnitude refusals fire BEFORE any decimal algebra (the
    * anovaOneWay broadcast-gate convention — under ANSI mode an
    * overflow would throw mid-job, under non-ANSI it would NULL the
    * term and SUM would silently skip it): a per-group bound rides a
    * broadcast build side that materializes before any moment task,
    * capping every moment at n·max(|v|,1)² and the Cramer products
    * at 6·(n·mx²)²·max(n·mx², n·mx·my) — both must stay under
    * 9·10³⁷ (safe margin below DECIMAL(38,0)/HUGEINT max).
    *
    * INFERENCE (r16): standard errors and t-statistics per
    * coefficient ride the same exact moments — [(X'X)⁻¹]_ii·det are
    * the diagonal COFACTORS (more Cramer algebra, exact integers),
    * se_i = sqrt(SSE/(n−3)·C_ii/det) and t_i = β_i/se_i are shared-
    * text double formulas — so the whole inference row stays
    * oracle-exact.
    *
    * @return (groupCol, n, b0, b1, b2, se0, se1, se2, t0, t1, t2,
    *         r2) — b0 the intercept; coefficients/se null for a
    *         singular group (constant or collinear covariates), se/t
    *         additionally null for n ≤ 3, t null on a perfect fit
    *         (SSE ≤ 0), r2 null on zero total variance
    */
  def fitGrouped2(df: DataFrame, groupCol: String, x1Col: String,
                  x2Col: String, yCol: String): DataFrame = {
    val rows = df.select(col(groupCol).as("g"),
      col(x1Col).cast("long").as("x1"),
      col(x2Col).cast("long").as("x2"),
      col(yCol).cast("long").as("y"))
    // the bound gates through a BROADCAST build side (r16 — the
    // anovaFromCells convention; previously its own count() action):
    // doubles can't overflow, the broadcast materializes BEFORE any
    // probe-side moment task, so a violating group raises the NAMED
    // refusal before the decimal aggregation can overflow (ANSI) or
    // NULL-poison (non-ANSI). x1 multiplies by __gate (always 1) so
    // column pruning can't strip the raise_error projection.
    val gate = broadcast(rows.groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("nd"),
        max(greatest(abs(col("x1")), abs(col("x2")), lit(1L))
          .cast("double")).as("mx"),
        max(greatest(abs(col("y")), lit(1L)).cast("double")).as("my"))
      .select(col("g"), (col("nd") * col("mx") * col("mx")).as("bx"),
        (col("nd") * col("mx") * col("my")).as("bxy"),
        (col("nd") * col("my") * col("my")).as("byy"))
      .select(col("g"),
        when(lit(6.0) * col("bx") * col("bx")
            * greatest(col("bx"), col("bxy")) < lit(9.0e37) &&
            col("byy") < lit(9.0e37), lit(1L))
          .otherwise(raise_error(lit(
            "fitGrouped2: a group's moment bound reaches the " +
              "DECIMAL(38,0) range — the exact Cramer algebra needs " +
              "6·M²·max(M,My) < 10³⁸; rescale to coarser units or " +
              "use fitFromGram (the double-moment scale path)"))
            .cast("bigint")).as("__gate")))
    val gated = rows.join(gate, Seq("g"))
      .select(col("g"), col("__gate"),
        (col("x1") * col("__gate")).as("x1"),
        col("x2"), col("y"))
    fitFromMoments2(moments2(gated, Some("__gate")), groupCol)
  }

  /** The exact integer moment table (g, n, sx1, sx2, sx1x1, sx2x2,
    * sx1x2, sy, sx1y, sx2y, syy) over (g, x1, x2, y) rows — the
    * ADDITIVE sufficient statistic of the two-covariate fit
    * ([[graft.streaming.StreamOls]] holds exactly this as state: two
    * shards' moment tables merge by column-wise DECIMAL addition).
    */
  private[graft] def moments2(rows: DataFrame,
                              countCol: Option[String] = None)
      : DataFrame = {
    def dcm(c: String): org.apache.spark.sql.Column =
      col(c).cast("decimal(38,0)")
    // countCol (r17): callers with an admission gate thread it into
    // the COUNT moment too (sum of a ×1 gate == count), so even a
    // projection that reads only n cannot prune the refusal
    rows.select(col("g") +: countCol.map(col).toSeq ++:
        Seq(dcm("x1").as("x1"), dcm("x2").as("x2"), dcm("y").as("y")): _*)
      .groupBy(col("g"))
      .agg(countCol.map(c => sum(col(c)).cast("decimal(38,0)"))
        .getOrElse(count(lit(1)).cast("decimal(38,0)")).as("n"),
        sum(col("x1")).as("sx1"), sum(col("x2")).as("sx2"),
        sum(col("x1") * col("x1")).as("sx1x1"),
        sum(col("x2") * col("x2")).as("sx2x2"),
        sum(col("x1") * col("x2")).as("sx1x2"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("y")).as("sx1y"),
        sum(col("x2") * col("y")).as("sx2y"),
        sum(col("y") * col("y")).as("syy"))
  }

  /** [[fitGrouped2]] from a pre-aggregated moment table — the
    * streaming-state form. Carries its OWN magnitude refusal derived
    * from the materialized moment values (the raw-row bound scan in
    * [[fitGrouped2]] certifies the aggregation; this one certifies
    * the Cramer products when the moments arrive already built).
    */
  private[graft] def fitFromMoments2(mIn: DataFrame,
                                     groupCol: String): DataFrame = {
    // det-bound refusal IN-PLAN (r16 — previously a localCheckpoint +
    // its own count() action): the bound rides doubles off the
    // materialized moments, so even NULL-poisoned (non-ANSI
    // overflowed) moments fall into the raise branch (a null guard
    // condition selects the otherwise), and det is read by every
    // output column, so no at-risk value escapes unguarded. Under
    // ANSI a genuinely overflowing Cramer product may throw Spark's
    // arithmetic error first — equally loud, never a wrong answer
    // (the raw-row path in fitGrouped2 gates BEFORE aggregation and
    // always names the refusal).
    val m = mIn
    val detOk = (lit(6.0) * col("__mx") * col("__mx") *
      greatest(col("__mx"), col("__my"))) < lit(9.0e37)
    m.withColumn("__mx",
        greatest(col("n"), abs(col("sx1")), abs(col("sx2")),
          col("sx1x1"), col("sx2x2"), abs(col("sx1x2"))).cast("double"))
      .withColumn("__my",
        greatest(abs(col("sy")), abs(col("sx1y")), abs(col("sx2y")))
          .cast("double"))
      .select(col("g") +: col("n") +: col("sy") +: col("sx1y") +:
        col("sx2y") +: col("syy") +:
        // EVERY Cramer product is guarded, not just det: within one
        // projection Spark may evaluate sibling columns in any order,
        // so an unguarded d2 could hit the ANSI overflow before the
        // guarded det raises the named refusal (observed)
        Seq("det" -> detSql, "d0" -> d0Sql, "d1" -> d1Sql,
          "d2" -> d2Sql, "c00" -> c00Sql, "c11" -> c11Sql,
          "c22" -> c22Sql).map { case (nm, sql) =>
          when(detOk, expr(sql).cast("decimal(38,0)"))
            .otherwise(raise_error(lit(
              "fitFromMoments2: a group's Cramer product bound " +
                "6·M²·max(M,My) reaches the DECIMAL(38,0) range — " +
                "rescale to coarser units or use fitFromGram (the " +
                "double-moment scale path)")).cast("decimal(38,0)"))
            .as(nm)
        }: _*)
      .select(col("g").as(groupCol), col("n").cast("bigint").as("n"),
        expr(coefSql("d0")).as("b0"),
        expr(coefSql("d1")).as("b1"),
        expr(coefSql("d2")).as("b2"),
        expr(seSql("c00")).as("se0"),
        expr(seSql("c11")).as("se1"),
        expr(seSql("c22")).as("se2"),
        expr(tSql("d0", "c00")).as("t0"),
        expr(tSql("d1", "c11")).as("t1"),
        expr(tSql("d2", "c22")).as("t2"),
        expr(r2Sql).as("r2"))
  }

  /** Per-group two-covariate RIDGE REGRESSION on the EXACT path
    * (r17) — (X'X + λ·diag(0,1,1))β = X'y over the SAME exact
    * integer moments as [[fitGrouped2]]: with integral λ the
    * penalized Cramer determinants ([[rdetSql]] family) are still
    * polynomial in exact integers, so every coefficient is ONE
    * double division of two exact integers — per-group REGULARIZED
    * fits that are oracle-exact. The intercept is unpenalized (the
    * standard convention); covariates are NOT standardized — λ is in
    * the units of the raw moments (document per use; the exactness
    * contract is the point, not unit-free shrinkage).
    *
    * One row-scale pass builds the moments ONCE; the λ axis is a
    * model-sized EXPLODE over them in the same plan (the oracle's
    * CROSS JOIN shape). λ = 0 equals [[fitGrouped2]]'s
    * coefficients bit-for-bit (the cross-operator spec).
    *
    * Magnitude refusal: the [[fitGrouped2]] broadcast-gate bound
    * with M inflated by max(λ) (the penalized diagonal entries are
    * up to λ larger), multiplied into x1 — pruning-proof.
    *
    * @param lambdas distinct non-negative integral penalties; one
    *                output row per (group, λ)
    * @return (groupCol, lambda, n, b0, b1, b2) — coefficients null
    *         for a singular penalized system (impossible for λ > 0
    *         unless the group is empty of variance AND λ small; the
    *         λ = 0 rows share OLS's singularity conventions)
    */
  def ridgeGrouped2(df: DataFrame, groupCol: String, x1Col: String,
                    x2Col: String, yCol: String,
                    lambdas: Seq[Long]): DataFrame = {
    require(lambdas.nonEmpty && lambdas.forall(_ >= 0L) &&
      lambdas.distinct.size == lambdas.size,
      "ridgeGrouped2: lambdas must be distinct and non-negative")
    val lmax = lambdas.max
    val rows = df.select(col(groupCol).as("g"),
      col(x1Col).cast("long").as("x1"),
      col(x2Col).cast("long").as("x2"),
      col(yCol).cast("long").as("y"))
    val gate = broadcast(rows.groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("nd"),
        max(greatest(abs(col("x1")), abs(col("x2")), lit(1L))
          .cast("double")).as("mx"),
        max(greatest(abs(col("y")), lit(1L)).cast("double")).as("my"))
      .select(col("g"),
        (col("nd") * col("mx") * col("mx") + lit(lmax.toDouble)).as("bx"),
        (col("nd") * col("mx") * col("my")).as("bxy"))
      .select(col("g"),
        when(lit(6.0) * col("bx") * col("bx")
            * greatest(col("bx"), col("bxy")) < lit(9.0e37), lit(1L))
          .otherwise(raise_error(lit(
            "ridgeGrouped2: a group's penalized moment bound reaches " +
              "the DECIMAL(38,0) range — the exact Cramer algebra " +
              "needs 6·M²·max(M,My) < 10³⁸ with M inflated by λ; " +
              "rescale to coarser units or shrink λ, or use " +
              "fitFromGram(lambda) (the double-moment scale path)"))
            .cast("bigint")).as("__gate")))
    val gated = rows.join(gate, Seq("g"))
      .select(col("g"), col("__gate"),
        (col("x1") * col("__gate")).as("x1"),
        col("x2"), col("y"))
    // ONE plan: the λ axis is a model-sized explode over the single
    // moment aggregate (the oracle's CROSS JOIN shape) — no pin, no
    // union, the row-scale pass runs exactly once; the gate rides
    // BOTH x1 and the count moment, so no projection escapes it
    moments2(gated, Some("__gate"))
      .withColumn("lambda",
        explode(array(lambdas.map(l => lit(l).cast("bigint")): _*)))
      .withColumn("rx1x1",
        (col("sx1x1") + col("lambda")).cast("decimal(38,0)"))
      .withColumn("rx2x2",
        (col("sx2x2") + col("lambda")).cast("decimal(38,0)"))
      .select(col("g"), col("lambda"), col("n"),
        expr(rdetSql).cast("decimal(38,0)").as("det"),
        expr(rd0Sql).cast("decimal(38,0)").as("d0"),
        expr(rd1Sql).cast("decimal(38,0)").as("d1"),
        expr(rd2Sql).cast("decimal(38,0)").as("d2"))
      .select(col("g").as(groupCol), col("lambda"),
        col("n").cast("bigint").as("n"),
        expr(coefSql("d0")).as("b0"),
        expr(coefSql("d1")).as("b1"),
        expr(coefSql("d2")).as("b2"))
  }

  /** Per-group OLS with intercept for ANY covariate count, on the
    * mergeable Gram moment machinery: one pass to a
    * (d+2)-dimensional moment state per group ([1-free: the
    * intercept column is implicit — n and the first moments ARE its
    * rows]), then a model-sized driver solve. REFUSES on more than
    * `maxGroups` groups (the collected state is the output scale),
    * on a singular / underdetermined group (collinear covariates,
    * n ≤ d — the coxPh convention: loud, named), never silently.
    *
    * Double moments: deterministic to ulps under a fixed
    * partitioning, NOT hash-exact across engines — rows-only.
    *
    * @return (groupCol, n, coefs array — [intercept, b1..bd], r2) —
    *         r2 null on zero total variance
    */
  def fitFromGram(df: DataFrame, groupCol: String, xCols: Seq[String],
                  yCol: String, maxGroups: Long = 100000L,
                  lambda: Double = 0.0): DataFrame = {
    require(xCols.nonEmpty, "fitFromGram: need at least one covariate")
    require(lambda >= 0.0, "fitFromGram: lambda must be non-negative")
    val d = xCols.size
    val dim = d + 1 // covariates + y in one Gram vector
    val spark = df.sparkSession
    val vec = array((xCols :+ yCol).map(c => col(c).cast("double")): _*)
    val moments = df.select(col(groupCol).as("g"), vec.as("z"))
      .groupBy(col("g"))
      .agg(Gram.moments(col("z"), dim).as("m"))
      .localCheckpoint(true) // group-count refusal + the collect
    val k = moments.count()
    require(k <= maxGroups,
      s"fitFromGram: $k groups > maxGroups=$maxGroups — the " +
        "normal-equation solve is a model-sized driver fold; " +
        "coarsen the grouping")
    val gType = moments.schema.head.dataType
    val out = moments.collect().map { r =>
      val g = r.get(0)
      val st = r.getSeq[Double](1).toArray
      val n = st(0)
      def first(i: Int): Double = st(1 + i)
      def cross(i0: Int, j0: Int): Double = {
        val (i, j) = if (i0 <= j0) (i0, j0) else (j0, i0)
        st(1 + dim + i * dim - i * (i - 1) / 2 + (j - i))
      }
      val p = d + 1 // intercept + covariates
      require(n > p,
        s"fitFromGram: group $g has n=${n.toLong} ≤ $p parameters — " +
          "underdetermined")
      val a = Array.ofDim[Double](p, p + 1) // augmented [A | b]
      a(0)(0) = n
      for (i <- 0 until d) { a(0)(1 + i) = first(i); a(1 + i)(0) = first(i) }
      for (i <- 0 until d; j <- 0 until d) a(1 + i)(1 + j) = cross(i, j)
      a(0)(p) = first(d)
      for (i <- 0 until d) a(1 + i)(p) = cross(i, d)
      val sy = first(d); val syy = cross(d, d)
      val xty = (0 until p).map(i => a(i)(p)).toArray
      // the UNpenalized Gram block, kept for the ridge SSE quadratic
      // form (the λ=0 path never reads it — bit-compat preserved)
      val xtx =
        if (lambda > 0.0)
          Array.tabulate(p, p)((i, j) => a(i)(j))
        else null
      // ridge (r17): penalize the covariate diagonal only — the
      // intercept row/column stays free (the ridgeGrouped2 convention)
      if (lambda > 0.0)
        for (i <- 0 until d) a(1 + i)(1 + i) += lambda
      // Gaussian elimination with partial pivoting; singular → refuse
      val scaleRef = (0 until p).map(i =>
        (0 until p).map(j => math.abs(a(i)(j))).max).max.max(1.0)
      for (c <- 0 until p) {
        val piv = (c until p).maxBy(r2 => math.abs(a(r2)(c)))
        require(math.abs(a(piv)(c)) > 1e-12 * scaleRef,
          s"fitFromGram: singular normal equations in group $g " +
            "(constant or collinear covariates) — drop the redundant " +
            "covariate")
        if (piv != c) { val t = a(piv); a(piv) = a(c); a(c) = t }
        for (r2 <- c + 1 until p) {
          val f = a(r2)(c) / a(c)(c)
          for (j <- c to p) a(r2)(j) -= f * a(c)(j)
        }
      }
      val beta = new Array[Double](p)
      for (c <- p - 1 to 0 by -1) {
        var s = a(c)(p)
        for (j <- c + 1 until p) s -= a(c)(j) * beta(j)
        beta(c) = s / a(c)(c)
      }
      val sst = syy - sy * sy / n
      // the β'X'y shortcut is an identity ONLY at the OLS optimum;
      // ridge solutions need the full quadratic form
      val sse =
        if (lambda > 0.0)
          syy - 2.0 * (0 until p).map(i => beta(i) * xty(i)).sum +
            (for (i <- 0 until p; j <- 0 until p)
              yield beta(i) * xtx(i)(j) * beta(j)).sum
        else syy - (0 until p).map(i => beta(i) * xty(i)).sum
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val r2v: Any =
        if (sst > 0) java.lang.Double.valueOf(r6(1.0 - sse / sst)) else null
      Row(g, n.toLong, beta.map(r6).toSeq, r2v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(StructField(groupCol, gType),
        StructField("n", LongType),
        StructField("coefs", ArrayType(DoubleType, false)),
        StructField("r2", DoubleType))))
  }
}

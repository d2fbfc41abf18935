package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Grouped LOGISTIC REGRESSION by driver-side Newton over the
  * model-sized cell table — the binary-outcome GLM completing the
  * regression shelf ([[Ols]] fits continuous responses,
  * [[Survival.coxPh]] censored times, this fits probabilities):
  * per group, maximize the Bernoulli likelihood of
  * y ~ sigmoid(b0 + b1·x1 + … + bd·xd).
  *
  * The [[Survival.coxPh]] architecture, grouped: the likelihood
  * depends on data ONLY through the per-(group, covariate-cell)
  * sufficient table (n trials, y successes per distinct x⃗ — the
  * log-likelihood is Σ_cells y·η − n·log(1+e^η)), so ONE distributed
  * aggregation builds it and ALL Newton/IRLS iterations run on the
  * driver over the collected table in sorted x⃗ order —
  * bit-deterministic (fixed iteration count, no convergence-test
  * float flip; summation order fixed by the sort). The cell cap
  * rides the collect itself via limit(maxCells+1) (the r17 coxPh
  * convention — bounded driver memory, no separate count() action).
  *
  * REFUSALS, loud and named (the coxPh conventions):
  *  - more than `maxCells` (group × covariate-cell) rows — bucket
  *    covariates first (bounded cell cardinality is the contract);
  *  - singular information (constant/collinear covariates);
  *  - SEPARATION: a coefficient walking past |β| > 30 means a
  *    hyperplane splits successes from failures — the MLE is at
  *    infinity and reporting a finite β would be a wrong answer
  *    (stated bound: e³⁰ ≈ 10¹³ odds, far past any data-supported
  *    effect).
  *
  * Rows-only correctness (transcendental likelihood — no SQL form):
  * the spec battery pins the closed forms instead — a single binary
  * covariate's MLE is EXACTLY the log odds ratio of the 2×2 table,
  * its standard error exactly sqrt(Σ 1/cell) (Woolf), symmetric data
  * gives β = 0, and the score at the returned β must vanish.
  *
  * @param xCols 1–4 integral-or-bucketed covariates (bounded cell
  *              cardinality — dummy-code categories first)
  * @return one row per (group, term): (groupCol, term, beta, se, z)
  *         with term ∈ {"intercept", xCols…}; beta/se rounded 9,
  *         z rounded 6
  */
object Logit {

  def fitGrouped(df: DataFrame, groupCol: String, xCols: Seq[String],
                 yCol: String, iters: Int = 12,
                 maxCells: Long = 200000L): DataFrame = {
    val d = xCols.length
    require(d >= 1 && d <= 4,
      s"Logit.fitGrouped: 1-4 covariates supported, got $d")
    val spark = df.sparkSession
    val sel = col(groupCol).as("__g") +:
      when(col(yCol).cast("boolean"), 1L).otherwise(0L).as("__y") +:
      xCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"__x$i") }
    val cellDf = df.select(sel: _*)
      .groupBy((col("__g") +: xCols.indices.map(i => col(s"__x$i"))): _*)
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col("__y")).cast("long").as("__yy"))
    val lim = math.min(maxCells + 1, Int.MaxValue.toLong).toInt
    val capped = cellDf.limit(lim).collect()
    require(capped.length <= maxCells,
      s"Logit.fitGrouped: more than maxCells=$maxCells " +
        "(group × covariate-cell) rows — bucket the covariates first")
    val gType = cellDf.schema.head.dataType
    val p = d + 1
    val byGroup = capped
      .map(r => (r.get(0),
        Array.tabulate(d)(i => r.getDouble(1 + i)),
        r.getLong(1 + d), r.getLong(2 + d)))
      .groupBy(_._1)
    // deterministic group order for the output frame
    val groups = byGroup.keys.toSeq.sortBy(g => String.valueOf(g))
    val out = groups.flatMap { g =>
      // sorted fold order: cells ascending by x⃗ — bit-deterministic
      val cells = byGroup(g).sortBy(_._2.mkString(","))
      val beta = Array.fill(p)(0.0)
      var info: Array[Array[Double]] = null
      var lastStep = Double.MaxValue
      for (_ <- 0 until iters) {
        val u = Array.fill(p)(0.0)
        info = Array.fill(p, p)(0.0)
        cells.foreach { case (_, x, n, y) =>
          var eta = beta(0)
          var i = 0
          while (i < d) { eta += beta(1 + i) * x(i); i += 1 }
          val pr = 1.0 / (1.0 + math.exp(-eta))
          val w = n * pr * (1.0 - pr)
          def xt(k: Int): Double = if (k == 0) 1.0 else x(k - 1)
          var k = 0
          while (k < p) {
            u(k) += (y - n * pr) * xt(k)
            var l = 0
            while (l < p) { info(k)(l) += w * xt(k) * xt(l); l += 1 }
            k += 1
          }
        }
        val delta = solve(info, u, g)
        lastStep = delta.map(math.abs).max
        var k = 0
        while (k < p) { beta(k) += delta(k); k += 1 }
        require(beta.forall(b => math.abs(b) <= 30.0),
          s"Logit.fitGrouped: group $g shows SEPARATION (a " +
            "coefficient diverged past |beta| > 30 — the MLE is at " +
            "infinity); drop or coarsen the separating covariate")
      }
      // complete-separation detector beyond the divergence bound: a
      // PERFECT fit (every cell all-success or all-failure, fitted
      // probabilities matching to ~0/1) means a hyperplane splits
      // the outcomes — the bound alone might not trip within a fixed
      // iteration budget while the walk is still accelerating
      val pure = cells.forall { case (_, _, n, y) => y == 0L || y == n }
      val fitGap = cells.map { case (_, x, n, y) =>
        var eta = beta(0)
        var i = 0
        while (i < d) { eta += beta(1 + i) * x(i); i += 1 }
        math.abs(y - n / (1.0 + math.exp(-eta)))
      }.max
      require(!(pure && fitGap < 1e-4 && cells.length > 1),
        s"Logit.fitGrouped: group $g shows SEPARATION (a hyperplane " +
          "splits successes from failures — the MLE is at infinity); " +
          "drop or coarsen the separating covariate")
      // quasi-complete separation walks |β| up ~linearly and may sit
      // under the divergence bound at the budget's end with the fit
      // still moving — an unconverged estimate is refused, not
      // reported (the PoissonReg twin guard)
      require(lastStep <= 1e-4,
        s"Logit.fitGrouped: group $g did not converge in $iters " +
          s"Newton iterations (last step $lastStep — quasi-complete " +
          "separation or a near-singular design); drop or coarsen " +
          "the separating covariate")
      val inv = invert(info, g)
      def r9(x: Double): Double =
        BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      ("intercept" +: xCols).zipWithIndex.map { case (term, k) =>
        val se = math.sqrt(inv(k)(k))
        Row(g, term, r9(beta(k)), r9(se), r6(beta(k) / se))
      }
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(StructField(groupCol, gType),
        StructField("term", StringType),
        StructField("beta", DoubleType), StructField("se", DoubleType),
        StructField("z", DoubleType))))
  }

  /** Gaussian elimination with partial pivoting; singular → named
    * refusal (constant/collinear covariates have no unique MLE).
    * Shared with [[PoissonReg]] (the same Newton machinery).
    */
  private[operators] def solve(aIn: Array[Array[Double]], b: Array[Double],
                    g: Any): Array[Double] = {
    val p = b.length
    val a = Array.tabulate(p, p + 1)((i, j) =>
      if (j < p) aIn(i)(j) else b(i))
    val scaleRef = a.flatMap(_.take(p)).map(math.abs).max.max(1e-300)
    for (c <- 0 until p) {
      val piv = (c until p).maxBy(r => math.abs(a(r)(c)))
      require(math.abs(a(piv)(c)) > 1e-12 * scaleRef,
        s"Logit.fitGrouped: singular information in group $g " +
          "(constant or collinear covariates) — drop the redundant " +
          "covariate")
      if (piv != c) { val t = a(piv); a(piv) = a(c); a(c) = t }
      for (r <- c + 1 until p) {
        val f = a(r)(c) / a(c)(c)
        for (j <- c to p) a(r)(j) -= f * a(c)(j)
      }
    }
    val x = new Array[Double](p)
    for (c <- p - 1 to 0 by -1) {
      var s = a(c)(p)
      for (j <- c + 1 until p) s -= a(c)(j) * x(j)
      x(c) = s / a(c)(c)
    }
    x
  }

  /** Inverse by solving against the identity columns. */
  private[operators] def invert(aIn: Array[Array[Double]],
                     g: Any): Array[Array[Double]] = {
    val p = aIn.length
    val cols = (0 until p).map { k =>
      solve(aIn, Array.tabulate(p)(i => if (i == k) 1.0 else 0.0), g)
    }
    Array.tabulate(p, p)((i, j) => cols(j)(i))
  }
}

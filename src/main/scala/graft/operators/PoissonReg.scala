package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Grouped POISSON REGRESSION (log link) by driver-side Newton over
  * the model-sized cell table — the COUNT-outcome GLM completing the
  * regression shelf: [[Ols]]/[[Ols.ridgeGrouped2]] fit continuous
  * responses, [[Logit]] probabilities, [[Survival.coxPh]] censored
  * times, this fits RATES — per group, maximize the Poisson
  * likelihood of y ~ exp(b0 + b1·x1 + … + bd·xd).
  *
  * The [[Logit]] architecture verbatim: the likelihood depends on
  * data only through the per-(group, covariate-cell) sufficient
  * table (n rows, S = Σy per distinct x⃗ — the log-likelihood is
  * Σ_cells S·η − n·e^η), so ONE distributed aggregation builds it
  * (cap riding the collect via limit(maxCells+1)) and all Newton
  * iterations run driver-side in sorted cell order —
  * bit-deterministic. Score U = Σ x̃(S − n·μ), information
  * I = Σ n·μ·x̃x̃' with μ = e^η; [[Logit.solve]]/[[Logit.invert]]
  * shared.
  *
  * REFUSALS: maxCells; singular information; DIVERGENCE — |β| > 30
  * means a covariate direction sends the likelihood to its supremum
  * at infinity (the Poisson analog of logistic separation: zero
  * counts confined to a half-space), plus a FINAL-STEP
  * convergence guard (an unsettled Newton walk after the fixed
  * budget is the slow divergence mode the bound misses — refused,
  * never reported as a finite estimate).
  *
  * Rows-only correctness (transcendental likelihood): closed forms
  * specced instead — a single binary covariate's MLE is EXACTLY the
  * log RATE RATIO β1 = log((S1/n1)/(S0/n0)) with
  * se1 = sqrt(1/S1 + 1/S0) and β0 = log(S0/n0), se0 = sqrt(1/S0);
  * equal rates give β1 = 0.
  *
  * @param xCols 1–4 integral-or-bucketed covariates (bounded cell
  *              cardinality — dummy-code categories first)
  * @param yCol  non-negative integral count outcome
  * @return one row per (group, term): (groupCol, term, beta, se, z)
  *         with term ∈ {"intercept", xCols…}; beta/se rounded 9,
  *         z rounded 6
  */
object PoissonReg {

  def fitGrouped(df: DataFrame, groupCol: String, xCols: Seq[String],
                 yCol: String, iters: Int = 12,
                 maxCells: Long = 200000L): DataFrame = {
    val d = xCols.length
    require(d >= 1 && d <= 4,
      s"PoissonReg.fitGrouped: 1-4 covariates supported, got $d")
    val spark = df.sparkSession
    val sel = col(groupCol).as("__g") +:
      col(yCol).cast("long").as("__y") +:
      xCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"__x$i") }
    val cellDf = df.select(sel: _*)
      .groupBy((col("__g") +: xCols.indices.map(i => col(s"__x$i"))): _*)
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col("__y")).cast("long").as("__s"),
        min(col("__y")).cast("long").as("__miny"))
    val lim = math.min(maxCells + 1, Int.MaxValue.toLong).toInt
    val capped = cellDf.limit(lim).collect()
    require(capped.length <= maxCells,
      s"PoissonReg.fitGrouped: more than maxCells=$maxCells " +
        "(group × covariate-cell) rows — bucket the covariates first")
    require(capped.forall(_.getLong(3 + d) >= 0L),
      "PoissonReg.fitGrouped: negative counts in " + yCol +
        " — the outcome must be a non-negative count")
    val gType = cellDf.schema.head.dataType
    val p = d + 1
    val byGroup = capped
      .map(r => (r.get(0),
        Array.tabulate(d)(i => r.getDouble(1 + i)),
        r.getLong(1 + d), r.getLong(2 + d)))
      .groupBy(_._1)
    val groups = byGroup.keys.toSeq.sortBy(g => String.valueOf(g))
    val out = groups.flatMap { g =>
      val cells = byGroup(g).sortBy(_._2.mkString(","))
      require(cells.exists(_._4 > 0L),
        s"PoissonReg.fitGrouped: group $g has zero total count — " +
          "the log-rate intercept is at -infinity; filter such " +
          "groups first")
      val beta = Array.fill(p)(0.0)
      // start the intercept at the group's log mean rate: Newton on
      // the Poisson likelihood from 0 can overshoot to overflow when
      // the true rate is far from 1; the canonical warm start is
      // deterministic (one closed form of exact integers)
      val nTot = cells.map(_._3).sum
      val sTot = cells.map(_._4).sum
      beta(0) = math.log(sTot.toDouble / nTot)
      var info: Array[Array[Double]] = null
      var lastStep = Double.MaxValue
      for (_ <- 0 until iters) {
        val u = Array.fill(p)(0.0)
        info = Array.fill(p, p)(0.0)
        cells.foreach { case (_, x, n, s0) =>
          var eta = beta(0)
          var i = 0
          while (i < d) { eta += beta(1 + i) * x(i); i += 1 }
          val mu = math.exp(eta)
          def xt(k: Int): Double = if (k == 0) 1.0 else x(k - 1)
          var k = 0
          while (k < p) {
            u(k) += (s0 - n * mu) * xt(k)
            var l = 0
            while (l < p) { info(k)(l) += n * mu * xt(k) * xt(l); l += 1 }
            k += 1
          }
        }
        val delta = Logit.solve(info, u, g)
        lastStep = delta.map(math.abs).max
        var k = 0
        while (k < p) { beta(k) += delta(k); k += 1 }
        require(beta.forall(b => math.abs(b) <= 30.0),
          s"PoissonReg.fitGrouped: group $g DIVERGED (a coefficient " +
            "passed |beta| > 30 — zero counts confined to a " +
            "covariate half-space put the MLE at infinity); drop or " +
            "coarsen the covariate")
      }
      // a walk that never settles is the SLOW divergence mode the
      // |β| bound misses inside a fixed budget: zero counts confined
      // to a covariate half-space move β by ~1 per iteration forever
      // — reporting the unconverged point estimate would be a wrong
      // answer
      require(lastStep <= 1e-4,
        s"PoissonReg.fitGrouped: group $g did not converge in " +
          s"$iters Newton iterations (last step $lastStep — zero " +
          "counts confined to a covariate half-space put the MLE at " +
          "infinity, or the design is near-singular); drop or " +
          "coarsen the covariate")
      val inv = Logit.invert(info, g)
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
}

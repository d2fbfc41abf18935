package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.{Gram, GraftFunctions}

/** Distributed PCA over an embedding column — the decorrelation /
  * dimensionality-reduction step of embedding pipelines (feeds
  * semantic dedup, ANN index compression, drift dashboards).
  * Scale-correct by construction:
  *
  *  - FIT is ONE aggregation: the mergeable [[graft.plans.Gram]]
  *    moment state (`n`, coordinate sums, upper-triangle second
  *    moments — ~17 KB at d=64) flows partial→final like any hash
  *    aggregate; no row ever reaches the driver.
  *  - The EIGENSOLVE runs on the driver over the d×d covariance —
  *    a model-sized cyclic-Jacobi iteration (d=64 → microseconds),
  *    the textbook symmetric-eigenproblem method; eigenvectors get a
  *    deterministic sign (largest-|coordinate| positive) so refits
  *    are comparable.
  *  - PROJECTION is a broadcast-model scan projection: each principal
  *    component is one codegen'd `graft_dot` against a literal
  *    component vector minus a precomputed scalar (`⟨μ, w_j⟩`), so
  *    scoring a 100 TB corpus is k fused multiply-add loops per row,
  *    zero shuffle.
  *
  * Fit cost is the honest O(d²) per row; for corpus-scale fits
  * compose with [[Sampling.portableSample]] (moments of a
  * deterministic sample) and project everything — the standard
  * estimator-vs-apply split.
  */
object EmbedPca {

  /** Principal-component model: population covariance eigenpairs,
    * eigenvalues descending. `components(j)` is the j-th axis (unit
    * norm); `totalVar` is the covariance trace (sum of ALL
    * eigenvalues, not just the kept k).
    */
  case class PcaModel(dim: Int, n: Long, mean: Array[Double],
                      eigenvalues: Array[Double],
                      components: Array[Array[Double]],
                      totalVar: Double) {
    /** Fraction of total variance captured by components 0..j. */
    def varianceExplained: Array[Double] = {
      val cum = eigenvalues.scanLeft(0.0)(_ + _).tail
      cum.map(c => if (totalVar > 0) c / totalVar else 0.0)
    }
  }

  /** One-pass fit: moment aggregate → driver covariance → Jacobi. */
  def fit(df: DataFrame, vecCol: String, k: Int, dim: Int): PcaModel = {
    require(k > 0 && k <= dim, s"k must be in 1..$dim, got $k")
    val state = df.agg(Gram.moments(col(vecCol), dim).as("m"))
      .head().getSeq[Double](0).toArray
    fromMoments(state, k, dim)
  }

  /** Build the model from an already-aggregated moment state (the
    * rollup path: per-shard `Gram.moments` united by `Gram.union`).
    */
  def fromMoments(state: Array[Double], k: Int, dim: Int): PcaModel = {
    require(state.length == Gram.stateLen(dim),
      s"moment state length ${state.length} != expected ${Gram.stateLen(dim)}")
    val n = state(0)
    require(n >= 2, s"PCA needs at least 2 vectors, saw ${n.toLong}")
    val mean = Array.tabulate(dim)(i => state(1 + i) / n)
    // population covariance: C_ij = S_ij/n − μ_i μ_j
    val cov = Array.ofDim[Double](dim, dim)
    var idx = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = state(idx) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    val trace = (0 until dim).map(d => cov(d)(d)).sum
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(d => -values(d)).take(k)
    val eigVals = order.map(values).toArray
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => vectors(r)(c))
      // deterministic sign: largest-|coordinate| positive
      val m = v.indices.maxBy(d => (math.abs(v(d)), -d))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    PcaModel(dim, n.toLong, mean, eigVals, comps, trace)
  }

  /** Append `pc1..pck` projection columns (centered scores) to the
    * rows of `df` — broadcast-model scan projection, no shuffle.
    *
    * `whiten = true` rescales each score by `1/√λ_j` so every
    * component has unit population variance — the decorrelated,
    * isotropic representation semantic-dedup and cosine-ANN distance
    * thresholds behave best under (a dominant direction no longer
    * dominates every distance). Components with λ ≤ `whitenEps` keep
    * scale 0 rather than exploding a near-null direction.
    */
  def project(df: DataFrame, model: PcaModel, vecCol: String,
              whiten: Boolean = false,
              whitenEps: Double = 1e-12): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val vecAsDouble: Column = transform(col(vecCol), _.cast("double"))
    model.components.zipWithIndex.foldLeft(df) { case (acc, (w, j)) =>
      val center = (0 until model.dim).map(d => model.mean(d) * w(d)).sum
      val scale =
        if (!whiten) 1.0
        else if (model.eigenvalues(j) > whitenEps)
          1.0 / math.sqrt(model.eigenvalues(j))
        else 0.0
      // Estimator/apply contract: fit() skips vectors shorter than
      // `dim` (they contribute no moments), so project() must not
      // silently score them either — the common-prefix dot product
      // would behave as zero-padding, indistinguishable downstream
      // from a real score. Short vectors get NULL scores instead.
      acc.withColumn(s"pc${j + 1}",
        when(size(col(vecCol)) >= model.dim,
          (GraftFunctions.dotFast(vecAsDouble, lit(w)) - lit(center)) *
            lit(scale)))
    }
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector matrix with vectors in COLUMNS). Driver-side,
    * model-sized (d ≤ a few hundred).
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 * (1.0 + frobenius(a)) && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // t = sign(θ)/(|θ|+√(θ²+1)), with θ=0 → t=1 (45° rotation)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset sampling and splitting for training pipelines.
  *
  * Both operators are fully deterministic and row-parallel:
  *  - `hashSplit` assigns each row to a split by hashing a stable id
  *    — reproducible across runs, machines, and table re-orderings
  *    (unlike `randomSplit`, which depends on partitioning), and any
  *    row's split can be recomputed independently (joins between
  *    split artifacts stay consistent);
  *  - `stratifiedSample` keeps an approximate per-stratum fraction
  *    using the same hash trick, so no per-stratum pass or state.
  */
object Sampling {

  private val Buckets = 1000000L

  private def bucket(idCol: Column, salt: String): Column =
    pmod(xxhash64(idCol, lit(salt)), lit(Buckets))

  /** Deterministic train/test split: (train, test) with ~`testFraction`
    * of rows in test, assigned by id hash.
    */
  def hashSplit(df: DataFrame, idCol: String, testFraction: Double,
                salt: String = "split"): (DataFrame, DataFrame) = {
    require(testFraction > 0 && testFraction < 1, "testFraction must be in (0,1)")
    val cut = (testFraction * Buckets).toLong
    val b = bucket(col(idCol), salt)
    (df.filter(b >= cut), df.filter(b < cut))
  }

  /** Engine-portable deterministic bucket: first 8 hex digits of
    * md5(id-as-string) mod `buckets`. Slower than the xxhash64 bucket
    * but recomputable bit-for-bit in any engine (the DuckDB oracle
    * recomputes it for `text_sample_det`), so a sample drawn here can
    * be reproduced by external tooling.
    */
  def portableBucket(idCol: Column, buckets: Long = 100L): Column =
    conv(substring(md5(idCol.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Deterministic `percent`% sample by portable bucket. */
  def portableSample(df: DataFrame, idCol: String, percent: Int): DataFrame =
    df.filter(portableBucket(col(idCol)) < percent)

  /** K-fold cross-validation assignment: `fold` = engine-portable
    * hash of (id, salt) mod k — deterministic across runs, machines
    * and partitionings (the [[hashSplit]] contract extended to k
    * folds); any row's fold is recomputable independently, so fold
    * artifacts stay joinable; `salt` redraws the folding.
    */
  def cvFolds(df: DataFrame, idCol: String, k: Int,
              salt: String = "cv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.withColumn("fold",
      portableBucket(
        concat(col(idCol).cast("string"), lit(":"), lit(salt)), k.toLong))
  }

  /** (train, test) for CV round `fold` of a k-folding. */
  def foldSplit(df: DataFrame, idCol: String, k: Int, fold: Int,
                salt: String = "cv"): (DataFrame, DataFrame) = {
    require(fold >= 0 && fold < k, s"fold must be in 0..${k - 1}, got $fold")
    val withF = cvFolds(df, idCol, k, salt)
    (withF.filter(col("fold") =!= fold).drop("fold"),
      withF.filter(col("fold") === fold).drop("fold"))
  }

  /** LEAKAGE-FREE train/val/test split: a near-duplicate COMPONENT is
    * assigned to one split atomically, so an eval split can never
    * contain a near-copy of a training document (hashing raw doc ids
    * — `hashSplit` — scatters the members of a duplicate cluster
    * across splits, which is train/test contamination by
    * construction). Each document's split key is its connected
    * component representative over the near-dup pair graph (min id;
    * [[Components.connectedComponents]]), falling back to its own id
    * for singletons; the key is mapped through the engine-portable
    * md5 bucket, so external tooling (and the DuckDB oracle) can
    * recompute any document's split bit-for-bit.
    *
    * At 100 TB: the pair graph is the (already bounded) output of the
    * banded/bucketed dedup operators, components converge in
    * O(log diameter) co-partitioned iterations, and the assignment
    * itself is one broadcast-or-shuffle join plus a projection — no
    * per-split passes, no driver state. Split fractions hold in
    * expectation per COMPONENT, not per document: a corpus dominated
    * by one giant duplicate family lands that family in one split by
    * design (that is the leakage guarantee), so audit component-size
    * skew with the dedup reports before relying on exact ratios.
    *
    * @param splits ordered (name, weight) with weights summing to 1
    * @return (idCol, split)
    */
  def leakFreeSplit(docs: DataFrame, idCol: String,
                    pairs: DataFrame, srcCol: String, dstCol: String,
                    splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val buckets = 100L
    val comp = Components.connectedComponents(pairs, srcCol, dstCol)
      .select(col("id").as(idCol), col("component"))
    val keyed = docs.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("__split_key"))
    val b = portableBucket(col("__split_key"), buckets)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
      .map(c => math.round(c * buckets))
    val assign = splits.map(_._1).zip(cuts).init
      .foldRight(lit(splits.last._1)) { case ((name, cut), rest) =>
        when(b < cut, name).otherwise(rest)
      }
    keyed.select(col(idCol), assign.as("split"))
  }

  /** Deterministic stratified sample: keep ~`fractions(stratum)` of
    * each stratum (default fraction for unlisted strata).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       salt: String = "strata"): DataFrame = {
    val cutExpr = fractions.foldLeft(lit((defaultFraction * Buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), salt) < cutExpr)
  }

  /** EXACT deterministic stratified sample: exactly
    * `floor(fraction * |stratum|)` rows from every stratum — the
    * training-data-mix contract where a 10% slice must be 10% of
    * EVERY language/source, not 10% in expectation. Rows are chosen
    * by engine-portable hash order ([[portableBucket]], ties by id),
    * so the selection is reproducible bit-for-bit by external tooling
    * and stable under re-partitioning. Costs one shuffle + per-group
    * sort (a window over the stratum) — exact quotas are inherently a
    * per-group rank; use [[stratifiedSample]] when approximate
    * fractions are acceptable at scan speed.
    */
  def stratifiedSampleExact(df: DataFrame, idCol: String, stratumCol: String,
                            fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0,1]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(portableBucket(col(idCol)), col(idCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__quota", floor(count(lit(1)).over(wAll) * fraction).cast("bigint"))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Per-group document CAP — the domain-balancing primitive of
    * web-corpus pipelines: keep at most `n` rows from every group
    * (source/domain/shard), chosen in engine-portable hash order
    * ([[portableBucket]], ties by id) so the kept set is reproducible
    * bit-for-bit and stable under re-partitioning. Unlike the quota
    * sampler's per-group window sort, the cap runs through the
    * TopKPerKey heap exec: partial per-partition heaps bound memory
    * and the exchange carries at most |partitions| x |groups| x n
    * rows — a hot domain with a billion documents never sorts, it
    * heap-selects.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  n: Int): DataFrame = {
    require(n > 0, "cap must be positive")
    val withBucket = df.withColumn("__pb", portableBucket(col(idCol)))
    org.apache.spark.sql.graft.TopKPerKey(withBucket, Seq(groupCol),
      Seq("__pb" -> false, idCol -> false), n).drop("__pb")
  }

  /** Temperature-scaled SOURCE-MIXTURE sampling — the multinomial
    * `p_s ∝ count_s^α` reweighting used to set training-data mixes
    * (α < 1 upweights small sources, the multilingual/low-resource
    * rebalancing shape of published LM data recipes). Exact and
    * engine-portable end to end:
    *
    *  - α is a quarter-integer (0, ¼, ½, ¾, 1) realized as a chain of
    *    IEEE `sqrt`s and one multiply. Each step is CORRECTLY ROUNDED
    *    by every IEEE-754 engine (unlike `pow`, which carries no such
    *    guarantee and can differ by an ulp between libms), so the
    *    weight `w_s = floor(count_s^α · 10⁶)` is bit-identical in any
    *    engine — the DuckDB oracle recomputes the same chain.
    *  - Quotas are integer algebra in decimal(38,0):
    *    `n_s = min(count_s, budget·w_s div Σw)` with
    *    `budget = N·num div den` — no float division anywhere near the
    *    doc-count boundary.
    *  - Selection within a source is the n_s smallest documents in
    *    engine-portable hash order ([[portableBucket]], ties by id),
    *    through the TopKPerKey heap exec with rank output — a hot
    *    source heap-selects (|partitions|·|sources|·maxQuota rows to
    *    the exchange), it never window-sorts its whole slice.
    *
    * Per-source shortfall is NOT redistributed: a source smaller than
    * its quota under-fills the budget (visible by comparing output
    * counts to quotas) rather than silently distorting the other
    * sources' temperature weights.
    *
    * At 100 TB: one count aggregation (model-sized result), quota
    * algebra on the source table (model-sized, one-row broadcast for
    * Σw), one heap-select pass over the corpus. The only driver-side
    * value is max quota (one scalar from the source-count table).
    *
    * @param alphaQuarters α in quarters: 0, 1, 2, 3 or 4 (= α·4)
    * @param budgetNum/budgetDen target sample size as a fraction
    *        num/den of the corpus
    * @return (idCol, groupCol) rows of the selected sample
    */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
                    alphaQuarters: Int, budgetNum: Long, budgetDen: Long)
      : DataFrame = {
    require(alphaQuarters >= 0 && alphaQuarters <= 4,
      s"alphaQuarters must be 0..4, got $alphaQuarters")
    require(budgetNum > 0 && budgetDen > 0 && budgetNum <= budgetDen,
      s"budget fraction must be in (0,1]: $budgetNum/$budgetDen")
    def powAlpha(x: Column): Column = alphaQuarters match {
      case 0 => lit(1.0)
      case 1 => sqrt(sqrt(x))
      case 2 => sqrt(x)
      case 3 => sqrt(x) * sqrt(sqrt(x))
      case 4 => x
    }
    val d38 = "decimal(38,0)"
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("bigint").as("__n"))
      .withColumn("__w",
        floor(powAlpha(col("__n").cast("double")) * lit(1000000.0))
          .cast(d38))
    val totals = counts.agg(sum(col("__w")).cast(d38).as("__sw"),
      sum(col("__n")).cast(d38).as("__ntot"))
    val quotas = counts.crossJoin(broadcast(totals))
      .withColumn("__budget",
        expr(s"CAST(__ntot * $budgetNum AS $d38) div CAST($budgetDen AS $d38)")
          .cast(d38))
      .withColumn("__quota",
        least(col("__n").cast(d38),
          expr(s"CAST(__budget * __w AS $d38) div __sw").cast(d38))
          .cast("bigint"))
      .select(col(groupCol), col("__quota"))
    // model-sized: one scalar off the per-source quota table
    val maxQuota = quotas.agg(max(col("__quota"))).head().getLong(0)
    if (maxQuota <= 0) return df.select(col(idCol), col(groupCol)).limit(0)
    val keyed = df.select(col(idCol), col(groupCol))
      .withColumn("__pb", portableBucket(col(idCol)))
    // Quotas are Long (budget-proportional): above Int.MaxValue the
    // per-key heap exec can't hold them (and a silent .toInt wrap
    // would truncate the selection with no error — a 2^32+100 quota
    // becoming 100). At quotas that size nearly the whole group is
    // kept anyway, so fall back to a windowed running count (Long
    // ranks, sort-per-key) instead of the heap.
    val ranked =
      if (maxQuota <= Int.MaxValue.toLong)
        org.apache.spark.sql.graft.TopKPerKey(keyed,
          Seq(groupCol), Seq("__pb" -> false, idCol -> false),
          maxQuota.toInt, rankCol = Some("__rn"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))
          .orderBy(col("__pb").asc, col(idCol).asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        keyed.withColumn("__rn", sum(lit(1L)).over(w))
      }
    ranked.join(broadcast(quotas), Seq(groupCol))
      .filter(col("__rn") <= col("__quota"))
      .select(col(idCol), col(groupCol))
  }

  /** Deterministic weighted sample WITHOUT replacement
    * (Efraimidis–Spirakis A-ES): each row draws an exponential with
    * rate = its weight from a hash-derived uniform, and the `k`
    * smallest draws win — selection probability is proportional to
    * weight, the contract behind training-mix/domain-weighting
    * sampling. The uniform comes from md5(id, salt) (52-bit mantissa,
    * uniform in (0,1]), so the sample is reproducible across runs,
    * machines, and any re-partitioning; changing `salt` redraws.
    * Rows with non-positive weight are excluded. Plans as
    * TakeOrderedAndProject (bounded per-partition heaps + a k-row
    * driver merge), never a full sort — at 100 TB the cost is the
    * scan plus k rows per partition.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = "wsample"): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(substring(md5(concat_ws("",
        col(idCol).cast("string"), lit(salt)).cast("binary")), 1, 13), 16, 10)
      .cast("double") + lit(1.0)) / lit(4503599627370496.0) // 2^52
    val key = -log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("__wkey", key)
      .orderBy(col("__wkey").asc, col(idCol).asc)
      .limit(k)
      .drop("__wkey")
  }

  /** Deterministic weighted sampling WITH replacement (bootstrap):
    * `k` independent draws, each row selected with probability
    * proportional to its integral weight. Draw `i` maps the
    * engine-portable md5 uniform onto the cumulative-weight axis
    * (`u = md5(i:salt) mod totalWeight`) and selects the unique row
    * whose interval `[cum − w, cum)` contains it — so any draw is
    * recomputable independently and the whole sample is reproducible
    * in any engine (the uniform comes from 13 hex digits = 52 hash
    * bits, so the mod bias is O(total/2⁵²) — deterministic and
    * identical on both sides).
    *
    * Scale shape: the cumulative axis comes from the distributed
    * [[PrefixSum]] (range partitions + offsets, never a single-task
    * window); the draw→interval lookup is a BIN-BUCKETED equi-join
    * (the RangeJoin trick on the weight axis) — no broadcast
    * nested-loop, no cartesian. Rows must be unique on `idCol`.
    */
  def bootstrapSample(df: DataFrame, idCol: String, weightCol: String,
                      k: Int, salt: String = "boot"): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    val w = df.select(col(idCol), col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0)
    val cum = PrefixSum.runningTotal(w, idCol, "__w", "__cum")
      .withColumn("__cum", col("__cum").cast("long"))
      .localCheckpoint(true) // total probe + the join both read it
    val total = cum.agg(max(col("__cum"))).collect()(0).getLong(0)
    require(total > 0, "no positive-weight rows")
    val binSize = math.max(1L, total / math.max(4L * k, 64L))
    val ivals = cum
      .withColumn("__lo", col("__cum") - col("__w"))
      .withColumn("__hi", col("__cum") - 1)
      .withColumn("__bin", explode(sequence(
        expr(s"__lo div $binSize"), expr(s"__hi div $binSize"))))
    // 13 hex digits = 52 uniform bits (portableBucket's 8/32 would
    // bias once totalWeight approaches 2^32 — real at corpus scale)
    val draws = spark.range(k).toDF("draw")
      .withColumn("__u", conv(substring(md5(
          concat(col("draw").cast("string"), lit(":"), lit(salt))
            .cast("binary")), 1, 13), 16, 10).cast("long") % total)
      .withColumn("__bin", expr(s"__u div $binSize"))
    draws.join(ivals, Seq("__bin"))
      .filter(col("__u") >= col("__lo") && col("__u") <= col("__hi"))
      .select(col("draw"), col(idCol))
  }

  /** Deterministic UNIFORM bootstrap resampling: `b` independent
    * resamples, each of size n (the input row count), drawn with
    * replacement — the input to bootstrap confidence intervals.
    * Uniform weights reduce the cumulative-axis lookup of
    * [[bootstrapSample]] to a RANK equi-join: draw j of resample
    * `j div n` selects the row at rank `md5(j:salt) mod n + 1` in
    * `idCol` order (distributed [[Ranking.globalRank]] — never a
    * global window). Appends `resample` (0-based); output volume is
    * b·n by construction.
    */
  def bootstrapResamples(df: DataFrame, idCol: String, b: Int,
                         salt: String = "bootci"): DataFrame = {
    require(b > 0, "b must be positive")
    val spark = df.sparkSession
    val ranked = Ranking.globalRank(df, idCol, "__rank")
      .localCheckpoint(true)
    val n = ranked.count()
    require(n > 0, "empty input")
    val draws = spark.range(b.toLong * n).toDF("__j")
      .withColumn("resample", expr(s"__j div $n"))
      .withColumn("__rank", conv(substring(md5(
          concat(col("__j").cast("string"), lit(":"), lit(salt))
            .cast("binary")), 1, 13), 16, 10).cast("long") % n + 1L)
      .drop("__j")
    draws.join(ranked, Seq("__rank")).drop("__rank")
  }

  /** Deterministic EPOCH UPSAMPLING: replicate each row according to
    * a fractional epoch weight — the standard way training mixes
    * express "see this source 2.5 times per epoch". Weights are given
    * in integer HUNDREDTHS (`250` = 2.5 epochs) so the split into
    * whole copies + fractional remainder is exact integer arithmetic,
    * never a float `floor` on a non-representable product.
    *
    * Every row gets `weight div 100` whole copies; one extra copy is
    * granted iff the row's engine-portable md5 bucket (0..99) falls
    * below `weight % 100` — so exactly the advertised fraction of
    * each source is upsampled once more, the choice is reproducible
    * in any engine, and re-partitioning cannot change it. Emits one
    * output row per copy with `copy` = 1..n (rows with zero copies
    * vanish, so a weight below 100 doubles as deterministic
    * DOWN-sampling). Pure scan-side `explode(sequence(...))` — no
    * shuffle, no state; at 100 TB the cost is the scan plus output
    * volume.
    */
  def epochUpsample(df: DataFrame, idCol: String, weightPctCol: Column,
                    salt: String = "upsample"): DataFrame = {
    // Column `/` is double division — floor() it back to whole copies
    // (exact: weights are far below 2^52)
    val whole = floor(weightPctCol.cast("long") / lit(100L)).cast("long")
    val frac = weightPctCol.cast("long") % 100L
    val extra = (portableBucket(
      concat(col(idCol).cast("string"), lit(":"), lit(salt))) < frac)
      .cast("long")
    val copies = whole + extra
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Per-group TOKEN-BUDGET cut — the real mixture-construction
    * selector ("each source contributes at most B tokens, best
    * quality first"), where [[capPerGroup]]'s doc-count cap can't
    * weigh a 10-token stub against a 10k-token article.
    *
    * Scale shape — a distributed per-group PREFIX SUM with no
    * partitioned window (the few-large-groups trap: one giant source
    * would sit in one window task): ONE composite-key
    * [[Ranking.globalRank]] over (group, quality order), ONE
    * [[PrefixSum]] cumulation over that rank axis (so the running
    * total is global in composite order), then the per-group running
    * total = global cum − (total mass of all PRIOR groups), where the
    * prior-group masses ride a second PrefixSum over the
    * GROUP-CARDINALITY totals table, broadcast back. Exact integers
    * end to end.
    *
    * @param orderCols quality order within the group, best first
    *        (append the unique id last — globalRank requires a total
    *        order)
    * @return input rows that fit the budget, with `cum_tokens` (the
    *         group-relative running total INCLUDING the row)
    */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String,
                          tokenCol: String, orderCols: Seq[String],
                          budget: Long): DataFrame = {
    require(budget >= 1, s"tokenBudgetPerGroup: budget must be >= 1, got $budget")
    val ranked = Ranking.globalRank(df, groupCol +: orderCols, "__gr", 0)
    val cum = PrefixSum.runningTotal(ranked, "__gr", tokenCol, "__cum")
    val groupTotals = df.groupBy(col(groupCol))
      .agg(sum(col(tokenCol)).cast("bigint").as("__gt"))
    val groupCum = PrefixSum.runningTotal(groupTotals, groupCol, "__gt", "__gcum")
      .select(col(groupCol), (col("__gcum") - col("__gt")).as("__prior"))
    cum.join(broadcast(groupCum), Seq(groupCol))
      .withColumn("cum_tokens",
        (col("__cum") - col("__prior")).cast("bigint"))
      .filter(col("cum_tokens") <= budget)
      .drop("__gr", "__cum", "__prior")
  }

  /** Iterative proportional fitting (raking, Deming–Stephan '40) —
    * the two-way corpus REBALANCER: per-(row, col) sampling weights
    * whose weighted mass matches UNIFORM row and column marginals
    * simultaneously (e.g. equalize languages AND sources at once —
    * one-way post-stratification can't hit both). The classic survey
    * / mixture-targeting algorithm, run for a FIXED iteration count.
    *
    * Exactness: weights live in ppm FIXED POINT and every step is
    * integer algebra — mass m = n·w in DECIMAL(38,0), row step
    * w ← (w·Tr) div rowmass, column step symmetric, with Tr = (N·10⁶)
    * div n_rows-groups — floor division spelled identically in the
    * oracle, so all `iters` rounds replay bit-for-bit (IPF converges
    * geometrically; 3 rounds ≈ ‰-level marginal fit).
    *
    * Shape: everything after one hash aggregate runs at CELL
    * cardinality (|rows|·|cols| — model-sized by construction);
    * `iters` bounded joins over that cell table.
    *
    * @return (rowCol, colCol, n, weight_ppm)
    */
  def rakeWeights(df: DataFrame, rowCol: String, colCol: String,
                  iters: Int = 3, maxIters: Int = 20): DataFrame = {
    require(iters >= 1 && iters <= maxIters,
      s"rakeWeights: iters=$iters outside 1..maxIters=$maxIters")
    val cells = df.groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
      .localCheckpoint(true)
    val scalars = cells.agg(
        sum(col("n")).cast("decimal(38,0)").as("__N"),
        countDistinct(col("__r")).cast("decimal(38,0)").as("__nr"),
        countDistinct(col("__c")).cast("decimal(38,0)").as("__nc"))
      .select(expr("(__N * 1000000) DIV __nr").cast("decimal(38,0)").as("__tr"),
        expr("(__N * 1000000) DIV __nc").cast("decimal(38,0)").as("__tc"))
    var w = cells.crossJoin(broadcast(scalars))
      .withColumn("w", lit(1000000L).cast("decimal(38,0)"))
    (1 to iters).foreach { _ =>
      val rowMass = w.groupBy(col("__r"))
        .agg(sum(col("n") * col("w")).cast("decimal(38,0)").as("__rm"))
      w = w.join(rowMass, Seq("__r"))
        .withColumn("w", expr("(w * __tr) DIV __rm").cast("decimal(38,0)"))
        .drop("__rm")
      val colMass = w.groupBy(col("__c"))
        .agg(sum(col("n") * col("w")).cast("decimal(38,0)").as("__cm"))
      w = w.join(colMass, Seq("__c"))
        .withColumn("w", expr("(w * __tc) DIV __cm").cast("decimal(38,0)"))
        .drop("__cm")
    }
    w.select(col("__r").as(rowCol), col("__c").as(colCol),
      col("n").cast("bigint").as("n"),
      col("w").cast("bigint").as("weight_ppm"))
  }

  /** Coverage-greedy corpus selection — the submodular (set-cover /
    * facility-location) "pick k docs that together cover the most
    * vocabulary" curation step: classic greedy picks the doc with the
    * largest count of still-uncovered tokens, k times. Greedy is the
    * (1−1/e)-approximation of the NP-hard optimum (Nemhauser '78) and
    * the standard data-selection baseline.
    *
    * Shape at 100 TB: the posting table (doc, token) is built ONCE
    * and pinned; each of the k rounds is one anti-join against the
    * covered-token set (vocabulary-sized, Heaps-bounded) + one hash
    * aggregate + a ONE-ROW argmax collect. Cost is k passes over the
    * posting table — k is the knob (`maxPicks`), not the data.
    * Deterministic: ties break on doc id; stops early when marginal
    * gain hits 0 (full coverage — extra picks would be arbitrary).
    *
    * @return (pick_rank, doc, gain, covered_total) — gain = tokens
    *         newly covered by this pick, covered_total cumulative
    */
  def coverageGreedy(df: DataFrame, idCol: String, textCol: String,
                     k: Int, maxPicks: Int = 100): DataFrame = {
    require(k >= 1 && k <= maxPicks,
      s"coverageGreedy: k=$k outside 1..maxPicks=$maxPicks — each pick " +
        "is a full posting pass; raise the knob deliberately")
    val spark = df.sparkSession
    import spark.implicits._
    val posting = df.select(col(idCol).cast("long").as("doc"),
        explode(graft.functions.wsTokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "").distinct()
      .localCheckpoint(true)
    var covered = posting.select(col("tok")).limit(0).localCheckpoint(true)
    val picks = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    var coveredTotal = 0L
    var round = 1
    var done = false
    while (round <= k && !done) {
      val gains = posting.join(covered, Seq("tok"), "left_anti")
        .groupBy(col("doc")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc")).limit(1)
        .as[(Long, Long)].collect()
      if (gains.isEmpty || gains.head._2 == 0L) done = true
      else {
        val (doc, gain) = gains.head
        coveredTotal += gain
        picks += ((round.toLong, doc, gain, coveredTotal))
        covered = covered.unionByName(
            posting.filter(col("doc") === doc).select(col("tok")))
          .distinct().localCheckpoint(true)
      }
      round += 1
    }
    spark.createDataset(picks.toSeq)
      .toDF("pick_rank", "doc", "gain", "covered_total")
  }

  /** Deterministic NEGATIVE sampling for link-prediction / contrastive
    * training: per user, the first `k` engine-portable pseudo-random
    * item draws that are NOT true edges — the "random non-interaction"
    * side of a (positive, negative) training pair, recomputable row-
    * independently (any (user, i) draw replays from the md5, so the
    * oracle and any downstream job can re-derive the sample without
    * the artifact).
    *
    * Draws: item(u, i) = portableHash(u:salt:i) mod numItems + 1 for
    * i = 1..k·oversample; true edges are removed by ONE anti-join on
    * (user, item) against the deduped edge set; a user's surviving
    * draws keep their first occurrence per item (collision dedup, min
    * i) and the k LOWEST draw indices win through the TopKPerKey
    * partial+final heap — never a per-user window sort. With
    * oversample·k draws against the usual sparse interaction matrix,
    * fewer-than-k survivors is a corner (dense users): those users
    * emit what survives rather than failing — the count is the
    * caller's signal.
    *
    * @param numItems item universe size; draws land in 1..numItems
    *        (the TPC-H dense-key convention — map your ids first)
    * @return (userCol, neg_rank, negative_item)
    */
  def negativeSample(users: DataFrame, userCol: String,
                     edges: DataFrame, edgeUserCol: String,
                     edgeItemCol: String, numItems: Long, k: Int,
                     oversample: Int = 4, salt: String = "neg")
      : DataFrame = {
    require(k >= 1, s"negativeSample: k must be >= 1, got $k")
    require(oversample >= 2,
      s"negativeSample: oversample must be >= 2, got $oversample")
    require(numItems >= 1,
      s"negativeSample: numItems must be >= 1, got $numItems")
    val cand = users.select(col(userCol).as("__u")).distinct()
      .withColumn("__i",
        explode(sequence(lit(1L), lit(k.toLong * oversample))))
      .withColumn("__item",
        portableBucket(concat(col("__u").cast("string"), lit(":" + salt + ":"),
          col("__i").cast("string")), numItems) + lit(1L))
    val trueEdges = edges.select(col(edgeUserCol).as("__u"),
      col(edgeItemCol).as("__item")).distinct()
    val surviving = cand.join(trueEdges, Seq("__u", "__item"), "left_anti")
      .groupBy(col("__u"), col("__item")).agg(min(col("__i")).as("__i"))
    org.apache.spark.sql.graft.TopKPerKey(
      surviving.select(col("__u"), col("__i"), col("__item")),
      Seq("__u"), Seq("__i" -> false, "__item" -> false), k,
      rankCol = Some("neg_rank"))
      .select(col("__u").as(userCol), col("neg_rank"),
        col("__item").as("negative_item"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MULTIPLE-TESTING machinery: the two-sided normal p-value as a
  * SHARED SQL expression and the Benjamini–Hochberg step-up FDR
  * adjustment (Benjamini & Hochberg 1995) — the "which of these K
  * test results survive?" layer over the per-group z statistics the
  * test family (Welch, Wilcoxon, log-rank, …) already emits.
  *
  * CROSS-ENGINE DETERMINISM: a normal CDF is transcendental — there
  * is no exact-integer form — so the p-value is the Abramowitz &
  * Stegun 26.2.17 rational approximation (|ε| < 7.5·10⁻⁸, far below
  * the reported 6 decimals) written ONCE as SQL text and evaluated
  * from the same parse on both engines ([[normalTwoSidedPSql]] is
  * `expr()`ed on the Spark side and textually embedded in the DuckDB
  * oracle), on z values already rounded to 6 — identical double
  * inputs, identical IEEE expression tree, identical doubles out.
  * The BH suffix minimum min_{j≥i}(m·p_(j)/j) is a single
  * descending-rank fold over the test table, which is MODEL-SIZED by
  * construction (one row per tested group) — so it runs on the
  * driver in sorted order under a named-cap refusal (the
  * kaplanMeier convention), bit-deterministic under any
  * partitioning; the oracle reproduces it as a min over the rank
  * pair set (a min over the same candidate set is order-free and
  * equals the fold).
  */
object StatTests {

  /** Two-sided normal p-value of a z-score column as SQL text —
    * Abramowitz & Stegun 26.2.17 (Zelen & Severo), Horner form.
    * Shared verbatim between Spark `expr()` and the DuckDB oracle.
    */
  def normalTwoSidedPSql(z: String): String = {
    val t = s"(1.0 / (1.0 + 0.2316419 * abs($z)))"
    s"least(1.0, 2.0 * (exp(-($z * $z) / 2.0) / " +
      s"sqrt(6.283185307179586)) * ($t * (0.319381530 + $t * " +
      s"(-0.356563782 + $t * (1.781477937 + $t * (-1.821255978 + " +
      s"$t * 1.330274429))))))"
  }

  /** Benjamini–Hochberg adjusted p-values over a (id, p) table:
    * rank ascending by (p, id), p_adj(i) = min(1, min_{j≥i} m·p_(j)/j)
    * — the step-up procedure's monotone envelope. The input p must
    * already be rounded (both engines see identical doubles). The
    * table is collected under a named cap (it is one row per TESTED
    * GROUP — model-sized by construction) and the suffix min folded
    * in descending-rank order on the driver.
    *
    * @return (idCol, p, i, m, p_adj, reject) ordered by i; reject =
    *         p_adj ≤ alpha decided on the ROUNDED p_adj (the same
    *         6-decimal value both engines hash)
    */
  def bhAdjust(df: DataFrame, idCol: String, pCol: String,
               alpha: Double = 0.05, maxTests: Long = 100000L)
      : DataFrame = {
    val spark = df.sparkSession
    val idType = df.select(col(idCol)).schema.head.dataType
    val n = df.count()
    require(n > 0 && n <= maxTests,
      s"bhAdjust: $n tests — need 1 <= tests <= maxTests=$maxTests " +
        "(the p-value table is one row per tested group; aggregate " +
        "further first)")
    val sorted = df.select(col(idCol), col(pCol).cast("double"))
      .orderBy(col(pCol).desc, col(idCol).desc).collect()
    val m = sorted.length
    var runMin = 1.0
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // descending rank: i = m, m-1, ..., 1
    val out = sorted.zipWithIndex.map { case (r, idx) =>
      val i = m - idx
      val q = math.min(1.0, m.toDouble * r.getDouble(1) / i.toDouble)
      if (q < runMin) runMin = q
      val pAdj = r6(runMin)
      org.apache.spark.sql.Row(r.get(0), r.getDouble(1),
        i.toLong, m.toLong, pAdj, pAdj <= alpha)
    }.reverse
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(StructField(idCol, idType),
        StructField("p", DoubleType), StructField("i", LongType),
        StructField("m", LongType), StructField("p_adj", DoubleType),
        StructField("reject", BooleanType))))
  }
}

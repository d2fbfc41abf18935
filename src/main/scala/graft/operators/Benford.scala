package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BENFORD'S-LAW first-digit conformance test (Newcomb 1881, Benford
  * 1938; Nigrini 2012 for the audit practice) — the classic
  * fraud/fabrication/data-quality screen: naturally-occurring
  * multi-scale amounts put digit d first with probability
  * log10(1 + 1/d); fabricated or truncated data rarely does. A
  * high chi-square against the Benford distribution is a FLAG, not
  * a verdict (uniform synthetic prices fail it by construction —
  * exactly what a screen should say about synthetic data).
  *
  * EXACT: the first digit comes from the value's decimal string
  * (positive integral values only — stated; string heads are
  * engine-identical where log10-based extraction would ride float
  * rounding); the reference probabilities are FIXED ppm integer
  * constants (largest-remainder rounded so they sum to exactly 10⁶);
  * each digit's chi-square contribution enters as the exact floor
  * ⌊(o·10⁶ − n·p)²·10⁶ / (n·p·10⁶)⌋ — numerators are squares, so
  * floor == truncation in both engines — making the total an
  * ORDER-FREE exact integer. One descaling, rounded 6. Magnitude
  * contract: (n·10⁶)²·10⁶ ≤ 10³⁸ holds to n = 10¹³ rows.
  */
object Benford {

  /** P(first digit = d)·10⁶, largest-remainder rounded to sum 10⁶. */
  val expectedPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
    5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** First-digit distribution of a positive integral column vs
    * Benford, with per-digit exact chi-square contributions and the
    * order-free total.
    *
    * @return 9 rows ordered by digit: (digit, observed, n,
    *         expected_ppm = n·p [expected count ×10⁶], term_ppm,
    *         chi2_ppm, chi2) — chi2_ppm/chi2 repeated per row (the
    *         table IS the test report)
    */
  def test(df: DataFrame, valueCol: String): DataFrame =
    testFromCounts(
      df.select(col(valueCol).cast("long").as("v"))
        .filter(col("v") > 0)
        .select(substring(col("v").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("o")))

  /** [[test]] from a pre-aggregated (digit, o) first-digit count
    * table — the streaming-state form
    * ([[graft.streaming.StreamBenford]]): the nine digit counts are
    * the additive sufficient statistic for the whole screen.
    */
  private[graft] def testFromCounts(obs: DataFrame): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    val expected = expectedPpm.toDF("digit", "p_ppm")
    val filled = broadcast(expected)
      .join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("o"))
      .localCheckpoint(true) // the n scalar + the term projection
    val n = filled.agg(sum(col("o")).cast("bigint").as("n"))
    val terms = filled.crossJoin(broadcast(n))
      .selectExpr("digit", "CAST(o AS BIGINT) AS observed", "n",
        "CAST(CAST(n AS DECIMAL(38,0)) * p_ppm AS BIGINT) AS expected_ppm",
        "CAST((CAST(o AS DECIMAL(38,0)) * 1000000 " +
          "- CAST(n AS DECIMAL(38,0)) * p_ppm) " +
          "* (CAST(o AS DECIMAL(38,0)) * 1000000 " +
          "- CAST(n AS DECIMAL(38,0)) * p_ppm) * 1000000 AS DECIMAL(38,0)) " +
          "DIV CAST(CAST(n AS DECIMAL(38,0)) * p_ppm * 1000000 " +
          "AS DECIMAL(38,0)) AS term_ppm")
      .localCheckpoint(true) // rows + the total
    val total = terms.agg(sum(col("term_ppm")).cast("bigint").as("chi2_ppm"))
    terms.crossJoin(broadcast(total))
      .withColumn("chi2",
        round(col("chi2_ppm").cast("double") / lit(1000000.0), 6))
      .orderBy(col("digit"))
  }
}

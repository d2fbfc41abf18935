package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ISOTONIC (PAV) CALIBRATION — pool-adjacent-violators regression
  * of a binary label on a score (Ayer et al. 1955; Zadrozny & Elkan
  * 2002's calibration use): the nonparametric monotone fit that
  * turns any ranking score into calibrated probabilities, the
  * step-function complement to the fixed-bin reliability diagram
  * (bins impose width; PAV lets the data pick the blocks).
  *
  * EXACT: the input collapses to the per-SCORE count table
  * (n, positives) — value-cardinality, the additive sufficient
  * statistic — and PAV pooling happens on the driver over the
  * collected table (named-cap refusal; the fit is model-sized by
  * definition) with violator comparisons as INTEGER
  * cross-multiplications pos_i·n_j ≥ pos_j·n_i — no float enters
  * until the final per-block rate division, rounded 9. The classic
  * stack algorithm is O(values): each merge pops one block.
  *
  * Output blocks are the fitted step function: score in
  * [score_lo, score_hi] → rate; rates strictly increase across
  * blocks (equal-rate neighbors merge — the canonical minimal
  * representation, spec-asserted).
  */
object Isotonic {

  /** @return (score_lo, score_hi, n, pos, rate) ordered by score_lo */
  def calibrate(df: DataFrame, scoreCol: String, labelCol: String,
                maxScoreValues: Long = 100000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("int").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("pos"))
    val nVals = counts.count()
    require(nVals <= maxScoreValues,
      s"isotonic: $nVals distinct score values > maxScoreValues=" +
        s"$maxScoreValues — bucket the score first (the fit is " +
        "model-sized by definition)")
    val rows = counts.orderBy(col("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // PAV stack: (lo, hi, n, pos); merge while the top violates
    // monotonicity vs the incoming block — integer cross-multiplied
    case class B(lo: Long, hi: Long, n: Long, pos: Long)
    val stack = scala.collection.mutable.ArrayBuffer[B]()
    rows.foreach { case (s, n, pos) =>
      var cur = B(s, s, n, pos)
      // pool while prev.rate >= cur.rate (>= merges equal-rate
      // neighbors too — the canonical minimal step function).
      // BigInt cross-multiplication: pos·n products overflow Long
      // past ~3e9 rows, which a 100 TB corpus exceeds
      while (stack.nonEmpty &&
        BigInt(stack.last.pos) * cur.n >= BigInt(cur.pos) * stack.last.n) {
        val p = stack.remove(stack.length - 1)
        cur = B(p.lo, cur.hi, p.n + cur.n, p.pos + cur.pos)
      }
      stack += cur
    }
    stack.toSeq.map(b => (b.lo, b.hi, b.n, b.pos,
        BigDecimal(b.pos).bigDecimal
          .divide(BigDecimal(b.n).bigDecimal, 9,
            java.math.RoundingMode.HALF_UP).doubleValue))
      .toDF("score_lo", "score_hi", "n", "pos", "rate")
  }
}

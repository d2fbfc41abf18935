package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation in one scan — the
  * Deequ/dbt-tests shape: a contract of named constraints evaluated
  * together, producing a machine-checkable report (one row per
  * check: violation count + pass flag).
  *
  * Every check compiles to a conditional-count AGGREGATE over the
  * same scan, so a 20-check contract on a 100 TB table costs one
  * pass — not 20 table scans the naive per-check loop pays.
  * [[Unique]] rides the same aggregate through count-distinct
  * (Catalyst plans the mix via Expand; the documented exactness
  * price, same as q51's exact ndv).
  *
  * Null semantics follow SQL constraint practice: range/set/pattern
  * checks skip nulls (nullability is [[NotNull]]'s job — a column
  * can be nullable AND range-constrained without double counting).
  *
  * Referential checks against another table need a join, not a scan
  * aggregate — that's the semi/anti join family (SURVEY §2b rows
  * 26/27), composed upstream of this validator if needed.
  */
object Expectations {

  sealed trait Check { def name: String }

  /** `col` must never be null. */
  case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }

  /** `cols` must be unique across non-null rows. Violations = number
    * of surplus duplicate rows.
    */
  case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Non-null values of `col` must lie in [lo, hi]. */
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col,$lo,$hi)"
  }

  /** Non-null values of `col` must be one of `values`. */
  case class InSet(col: String, values: Seq[String]) extends Check {
    def name = s"in_set($col)"
  }

  /** Non-null values of `col` must match `regex` (RE2-safe subset). */
  case class Matches(col: String, regex: String) extends Check {
    def name = s"matches($col)"
  }

  /** The table must hold at least `n` rows. Violations = shortfall. */
  case class RowCountAtLeast(n: Long) extends Check {
    def name = s"row_count_at_least($n)"
  }

  private def violations(c: Check): Column = c match {
    case NotNull(col0) =>
      sum(when(col(col0).isNull, 1L).otherwise(0L))
    case Unique(cols0) =>
      val allSet = cols0.map(col(_).isNotNull).reduce(_ && _)
      sum(when(allSet, 1L).otherwise(0L)) -
        countDistinct(cols0.head, cols0.tail: _*)
    case InRange(col0, lo, hi) =>
      // a non-null value that does not PARSE as a number violates the
      // range too (try_cast-to-null must not silently pass the check;
      // try_cast, not cast — ANSI mode would abort the whole contract
      // on the first malformed value instead of counting it)
      val asNum = expr(s"try_cast(`$col0` AS double)")
      sum(when(col(col0).isNotNull &&
        (asNum.isNull || !asNum.between(lo, hi)), 1L).otherwise(0L))
    case InSet(col0, values) =>
      sum(when(col(col0).isNotNull &&
        !col(col0).isin(values: _*), 1L).otherwise(0L))
    case Matches(col0, regex) =>
      sum(when(col(col0).isNotNull &&
        !col(col0).rlike(regex), 1L).otherwise(0L))
    case RowCountAtLeast(n) =>
      greatest(lit(n) - count(lit(1)), lit(0L))
  }

  /** The validation report: (check_name, n_violations, passed), one
    * row per check, all from one scan of `df`.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Expectations.validate needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      coalesce(violations(c).cast("long"), lit(0L)).as(s"__v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"'${c.name.replace("'", "")}', `__v_$i`" }
      .mkString(", ")
    one.select(expr(
        s"stack(${checks.size}, $stackArgs) AS (check_name, n_violations)"))
      .select(col("check_name"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
  }
}

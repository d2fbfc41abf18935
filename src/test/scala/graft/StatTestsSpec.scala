package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StatTests

/** Multiple-testing machinery: the shared-text normal p-value
  * ([[StatTests.normalTwoSidedPSql]]) against table values, and the
  * Benjamini–Hochberg step-up ([[StatTests.bhAdjust]]) against a
  * hand trace — monotone envelope, cap at 1, tie determinism,
  * refusal.
  */
class StatTestsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def p(z: Double): Double =
    Seq(z).toDF("z")
      .select(expr(StatTests.normalTwoSidedPSql("z")).as("p"))
      .head().getDouble(0)

  test("normal p: table values within the A&S 7.5e-8 bound") {
    // two-sided: 2·(1 − Φ(|z|))
    assert(math.abs(p(1.959964) - 0.05) < 2e-7, p(1.959964).toString)
    assert(math.abs(p(1.0) - 0.317310508) < 2e-7)
    assert(math.abs(p(2.575829) - 0.01) < 2e-7)
    assert(math.abs(p(0.0) - 1.0) < 2e-7)
    // symmetric in z
    assert(p(-1.5) == p(1.5))
    // capped at 1 exactly
    assert(p(0.0) <= 1.0)
  }

  test("BH hand trace: the step-up envelope and rejections") {
    val tests = Seq(("a", 0.005), ("b", 0.011), ("c", 0.02),
      ("d", 0.04), ("e", 0.13)).toDF("id", "p")
    val got = StatTests.bhAdjust(tests, "id", "p").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(4),
        r.getBoolean(5)))
    // q_i = 5·p_i/i = (.025, .0275, .0333…, .05, .13); suffix mins
    assert(got.toSeq == Seq(("a", 1L, 0.025, true),
      ("b", 2L, 0.0275, true), ("c", 3L, 0.033333, true),
      ("d", 4L, 0.05, true), ("e", 5L, 0.13, false)), got.mkString(", "))
  }

  test("BH: the envelope is monotone and capped at 1") {
    val tests = Seq(("a", 0.001), ("b", 0.5), ("c", 0.9),
      ("d", 0.95)).toDF("id", "p")
    val got = StatTests.bhAdjust(tests, "id", "p").collect()
      .map(r => r.getDouble(4))
    assert(got.toSeq == got.sorted.toSeq, got.mkString(", "))
    assert(got.forall(_ <= 1.0))
    // p=0.9 at i=3: 4·0.9/3 = 1.2 → capped by min(1, ·) = 1 (then the
    // i=4 candidate 0.95 wins the suffix min)
    assert(got(2) == 0.95 && got(3) == 0.95)
  }

  test("BH: equal p-values break ties on id — deterministic ranks") {
    val tests = Seq(("b", 0.02), ("a", 0.02), ("c", 0.02)).toDF("id", "p")
    val got = StatTests.bhAdjust(tests, "id", "p").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("BH refuses above the named cap and on empty input") {
    val tests = Seq(("a", 0.5), ("b", 0.6)).toDF("id", "p")
    val e = intercept[IllegalArgumentException] {
      StatTests.bhAdjust(tests, "id", "p", maxTests = 1L)
    }
    assert(e.getMessage.contains("maxTests"))
    intercept[IllegalArgumentException] {
      StatTests.bhAdjust(tests.filter(col("p") > 2), "id", "p")
    }
  }
}

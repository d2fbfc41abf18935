package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{GroupTests, RankCorr, RobustStats}

/** PRUNED-PROJECTION refusal sweep (r17) — the hazard class the r16
  * verdict named: an in-plan `raise_error` guard only fires if the
  * column carrying it survives the consumer's projection, so every
  * guarded operator must thread its gate into columns that ANY
  * statistic-reading projection keeps. Each test selects a
  * deliberately guard-free-looking column subset from a VIOLATING
  * input and asserts the refusal still fires.
  *
  * Sweep record (every raise_error site in operators/ at r17):
  *  - mannWhitney — gate multiplied into na/nb (fixed this round;
  *    previously only u2/z were guarded and a (g, na, nb) projection
  *    returned a malformed family silently)
  *  - friedman / pageTrend / kendallW — gate carried as __g through
  *    the m2 aggregate into the count columns (fixed this round; a
  *    counts-only projection previously pruned every m2-derived
  *    aggregate and the refusal with it)
  *  - cochranQ — n_blocks multiplied by the colT-side __g (fixed this
  *    round; rowR never joins the gate)
  *  - theilSen — gate multiplied into x, which every output column
  *    derives from (moved in-plan this round)
  *  - anovaOneWay/anovaFromCells — gate multiplied into n_j (the r16
  *    convention this sweep generalizes); n = Σn_j keeps it
  *  - kruskalWallis — rsq_sum/t3t/h all guarded directly; k and n are
  *    not at-risk values (no overflow can corrupt them)
  *  - moodMedianTest — gate rides the broadcast median position,
  *    which the per-sample split FILTERS on: no output exists without
  *    evaluating it
  *  - cmh — gate inside every term's CASE
  *  - cramersV / skewKurtosis / fitGrouped2 / fitFromMoments2 —
  *    broadcast gates multiplied into kept columns (r16, re-checked)
  *  - RangeJoin — gate rides the bin column the join itself probes
  *  - cumFromCountsWith — driver-side require on the same collect
  *    (not prunable)
  */
class Round17GuardSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mannWhitney refuses under a counts-only (g, na, nb) " +
      "projection — the pruned-gate trap") {
    val bad = Seq(("f", "A", 1L), ("f", "B", 2L), ("f", "C", 3L))
      .toDF("g", "s", "v")
    val e = SparkTestSession.refusalMessage {
      RankCorr.mannWhitney(bad, "g", "s", "v", "A")
        .select("g", "na", "nb").collect()
    }
    assert(e.contains("exactly two samples"), e)
    // and the gate is a ×1 identity on admissible input
    val ok = Seq(("f", "A", 1L), ("f", "B", 2L)).toDF("g", "s", "v")
    val r = RankCorr.mannWhitney(ok, "g", "s", "v", "A")
      .select("na", "nb").collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
  }

  test("theilSen refuses under a slope-free (g, n_points) projection") {
    val df = Seq(("f", 1L, 1L), ("f", 2L, 2L), ("f", 3L, 3L))
      .toDF("g", "x", "y")
    val e = SparkTestSession.refusalMessage {
      RobustStats.theilSen(df, "g", "x", "y", maxPoints = 2L)
        .select("g", "n_points").collect()
    }
    assert(e.contains("maxPoints"), e)
  }

  test("friedman refuses incomplete blocks under an n_blocks-only " +
      "projection") {
    val rows = Seq(("f", "b1", 1L, 1L), ("f", "b1", 2L, 2L),
      ("f", "b2", 1L, 3L)).toDF("g", "b", "trt", "v")
    val e = SparkTestSession.refusalMessage {
      RankCorr.friedman(rows, "g", "b", "trt", "v")
        .select("g", "n_blocks").collect()
    }
    assert(e.contains("incomplete"), e)
  }

  test("pageTrend refuses incomplete blocks under an n_blocks-only " +
      "projection") {
    val rows = Seq(("f", "b1", 1L, 1L), ("f", "b1", 2L, 2L),
      ("f", "b2", 1L, 3L)).toDF("g", "b", "trt", "v")
    val e = SparkTestSession.refusalMessage {
      RankCorr.pageTrend(rows, "g", "b", "trt", "v")
        .select("g", "n_blocks").collect()
    }
    assert(e.contains("incomplete"), e)
  }

  test("cochranQ refuses duplicate cells under an n_blocks-only " +
      "projection") {
    val rows = Seq(("f", "b1", 1L, 1L), ("f", "b1", 1L, 0L),
      ("f", "b1", 2L, 1L), ("f", "b2", 1L, 0L), ("f", "b2", 2L, 1L))
      .toDF("g", "b", "trt", "x")
    val e = SparkTestSession.refusalMessage {
      GroupTests.cochranQ(rows, "g", "b", "trt", "x")
        .select("g", "n_blocks").collect()
    }
    assert(e.contains("multiple"), e)
  }

  test("anovaOneWay refuses its magnitude violation under an " +
      "(g, n)-only projection") {
    val rows = Seq(("f", "s1", 4000000000000000000L), ("f", "s1", 1L),
      ("f", "s2", 2L)).toDF("g", "s", "v")
    val e = SparkTestSession.refusalMessage {
      GroupTests.anovaOneWay(rows, "g", "s", "v")
        .select("g", "n").collect()
    }
    assert(e.contains("rescale"), e)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate: the headline queries must keep the
  * physical plans they were tuned to — pushdown reaching the scan,
  * dimension joins broadcast, single-exchange merges, heap-based
  * top-k with no Window/Sort. A failure here means a rewrite
  * regressed the 100 TB story even if results still match.
  *
  * Assertions run on the sf0.001 data (plan shape is data-size
  * independent apart from AQE broadcast decisions, which these
  * queries pin via explicit `broadcast()` hints).
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  /** Simple-mode physical plan: one line per node, so node names can
    * be counted (formatted mode lists every node twice — tree + detail).
    */
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("simple"))
  }

  private def planFormatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  /** Shuffle exchanges only (excludes BroadcastExchange). */
  private def shuffles(p: String): Int =
    "(?<!Broadcast)Exchange ".r.findAllIn(p).size

  /** Physical Sort operators (excludes SortAggregate/SortMergeJoin and
    * sort expression names like array_sort).
    */
  private def sorts(p: String): Int = "\\bSort \\[".r.findAllIn(p).size

  private def count(hay: String, needle: String): Int =
    needle.r.findAllIn(hay).size

  test("q2: filters are pushed to the parquet scan") {
    val p = planFormatted("q2_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert("PushedFilters: \\[[A-Z]".r.findFirstIn(p).isDefined,
      s"scan has empty pushdown:\n$p")
  }

  test("q34: range join broadcasts intervals — no nested loop, two exchanges") {
    val p = plan("q34_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // probe spread + final per-order aggregation; a third exchange
    // means the bin equi-join stopped lining up
    assert(shuffles(p) == 2, s"expected 2 shuffles:\n$p")
  }

  test("q35: LOCF window reuses the grid partitioning — no extra exchange") {
    val p = plan("q35_gap_fill")
    assert(p.contains("Window"), p)
    // grid agg + daily agg only; the window must NOT add a third
    assert(shuffles(p) == 2, s"expected 2 shuffles:\n$p")
  }

  test("q38: group stats broadcast back to the scan — single exchange") {
    val p = plan("q38_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(shuffles(p) == 1, s"expected 1 shuffle (stats agg only):\n$p")
  }

  test("q22: window form scans orders once, no self-join") {
    val p = plan("q22_correlated")
    assert(count(p, "FileScan parquet") == 1,
      s"q22 must read orders exactly once:\n$p")
    assert(!p.contains("Join"), s"q22 regressed to the agg+self-join decorrelation:\n$p")
    assert(shuffles(p) == 1, s"q22 needs exactly one customer-key exchange:\n$p")
  }

  test("dimension joins broadcast: q3, q5, q15") {
    Seq("q3_top_orders", "q5_region_revenue", "q15_enrich").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast join:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q fell back to SMJ:\n$p")
    }
  }

  test("cdc_merge_latest: exactly one shuffle, map-side partial max_by") {
    val p = plan("cdc_merge_latest")
    assert(shuffles(p) == 1, s"merge must shuffle exactly once:\n$p")
    assert(p.contains("partial_max_by"), s"merge lost map-side partials:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("q28 custom as-of join: two exchanges, no window, no broadcast NL join") {
    val p = plan("q28_asof_custom")
    assert(shuffles(p) == 2, s"as-of join must shuffle each side once:\n$p")
    assert(!p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ANN top-k paths: heap exec with map-side partial, no Window, no Sort") {
    Seq("ann_topk", "ann_lsh", "ann_ivf", "ann_ivf_indexed", "ann_pq").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window"), s"$q regressed to a window top-k:\n$p")
      assert(sorts(p) == 0, s"$q sorts candidates:\n$p")
      assert(count(p, "TopKPerKey") == 2,
        s"$q must plan partial+final TopKPerKey passes:\n$p")
    }
  }

  test("equi-depth histogram: broadcast cutpoints, no window, no sort") {
    val p = plan("q67_equidepth_histogram")
    assert(!p.contains("Window"), s"ntile-style window crept in:\n$p")
    assert(sorts(p) == 0, s"global sort crept in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"cutpoints must ride a broadcast:\n$p")
  }

  test("entity resolution: blocked equi-join candidates, no cartesian pair generation") {
    val p = plan("q66_entity_resolution")
    assert(!p.contains("CartesianProduct"), s"unblocked pair join:\n$p")
  }

  test("mixture sample: quota selection heap-selects, never window-sorts a source") {
    val p = plan("text_mixture_sample")
    assert(count(p, "TopKPerKey") == 2,
      s"per-source selection must be partial+final heaps:\n$p")
    assert(!p.contains("Window"), s"window sort crept into the selection:\n$p")
  }

  test("q21 custom top-k: partial+final TopKPerKey, single exchange, no sort") {
    val p = plan("q21_topk_custom")
    assert(count(p, "TopKPerKey") == 2, p)
    assert(shuffles(p) == 1, p)
    assert(!p.contains("Window"), p)
    assert(sorts(p) == 0, p)
  }

  test("exact dedup: hash aggregates, no extra shuffles") {
    val p = plan("dedup_exact")
    assert(shuffles(p) <= 2, p) // group-by-hash + count-distinct rollup
    assert(p.contains("HashAggregate"), p)
  }

  test("q1 aggregate keeps map-side partial aggregation") {
    val p = plan("q1_pricing_summary")
    // partial + final HashAggregate pair around a single exchange
    assert(count(p, "HashAggregate") >= 2, p)
    assert(shuffles(p) == 1, p)
  }

  test("q14 top-k global sort-limit plans as TakeOrderedAndProject") {
    val p = plan("q14_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q26 funnel: events scanned exactly once (window chain, no rejoins)") {
    val p = plan("q26_funnel")
    assert(count(p, "FileScan") == 1,
      s"funnel regressed to multiple event scans:\n$p")
    assert(!p.contains("Join"), s"funnel should not join:\n$p")
  }

  test("q49 global sort: parallel range-partitioned sort, no single-task collapse") {
    val p = plan("q49_global_sort")
    assert(p.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange:\n$p")
    assert(sorts(p) >= 1, s"expected a Sort node:\n$p")
    assert(!p.contains("SinglePartition"), s"sort collapsed to one task:\n$p")
  }

  test("text_lm_score: token counts combine map-side; scalar total broadcasts") {
    val p = plan("text_lm_score")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"token counting lost map-side partial aggregation:\n$p")
    assert(count(p, "BroadcastExchange") >= 1,
      s"the one-row total should broadcast, not shuffle:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"scalar cross join must stay broadcast:\n$p")
  }

  test("text_drift: corpus scanned exactly ONCE in the executed final plan") {
    // the drift query fans st out to four consumers (join side, ct,
    // ns, n) with no persist; exchange/stage reuse is what keeps that
    // ONE corpus scan. Nothing in the optimizer CONTRACTUALLY
    // guarantees that reuse — this gate pins it, because the silent
    // fallback at 100 TB is four full corpus explodes
    val df = SparkEntry.queries("text_drift")(spark, sf)
    df.queryExecution.toRdd.count()
    val scans = graft.plans.PlanAudit.executedScansOf(df, "documents")
    assert(scans == 1,
      s"text_drift executed $scans scans of documents — exchange reuse broke")
  }

  test("text_importance: corpus scanned exactly ONCE in the executed final plan") {
    // the scoring join and the weight model both derive from the same
    // (doc, bucket, count) aggregation; exchange/stage reuse is what
    // keeps that ONE corpus scan (and ONE n-gram md5 pass). The
    // silent fallback is a second full explode+hash of the corpus
    val df = SparkEntry.queries("text_importance")(spark, sf)
    df.queryExecution.toRdd.count()
    val scans = graft.plans.PlanAudit.executedScansOf(df, "documents")
    assert(scans == 1,
      s"text_importance executed $scans scans of documents — exchange reuse broke")
  }

  test("text_lm_score: at most two corpus scans; count subtree reused by the total") {
    // lmScore's probe side (scan+explode) and count side (scan+
    // explode+partial agg) are structurally different subtrees, so
    // two scans is this query's floor; the scalar total must REUSE
    // the count subtree rather than add a third scan
    val df = SparkEntry.queries("text_lm_score")(spark, sf)
    df.queryExecution.toRdd.count()
    val scans = graft.plans.PlanAudit.executedScansOf(df, "documents")
    assert(scans <= 2,
      s"text_lm_score executed $scans scans of documents — the scalar " +
        "total stopped reusing the token-count subtree")
  }

  test("q53 SCD2 lookup: broadcast hash join with interval residual, no nested loop") {
    val p = plan("q53_scd2")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("text_line_dedup: no line string crosses an exchange; text moves once") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
    val df = SparkEntry.queries("text_line_dedup")(spark, sf)
    val physical = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val exchanges = physical.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty)
    def hasString(dt: DataType): Boolean = dt match {
      case StringType        => true
      case ArrayType(et, _)  => hasString(et)
      case st: StructType    => st.fields.exists(f => hasString(f.dataType))
      case _                 => false
    }
    // per-line exchanges carry (id, line_no, xxhash64) — never the line
    exchanges.foreach { e =>
      assert(e.output.forall(a => a.name != "line" && a.name != "__line"),
        s"an exchange carries the line string: ${e.output.mkString(", ")}")
    }
    // document text (the __lines array) crosses at most one exchange —
    // the id-keyed reassembly join (at small SF the kept-positions side
    // broadcasts instead and text never shuffles at all)
    val textBearing = exchanges.filter(_.output.exists(a => hasString(a.dataType)))
    assert(textBearing.size <= 1,
      s"expected at most one text-bearing exchange, got ${textBearing.size}:\n" +
        textBearing.map(_.output.mkString(", ")).mkString("\n"))
  }
}

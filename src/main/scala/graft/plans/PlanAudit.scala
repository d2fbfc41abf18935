package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Physical-plan lint — the 100 TB readiness checks the test suite's
  * PlanShapeSpec applies to the contract queries, packaged as a
  * library operator so ANY query can be audited before it burns a
  * cluster-day. Each rule flags a plan shape that works at test
  * scale and fails at 100×:
  *
  *  - `cartesian-product` / `broadcast-nested-loop` (critical): an
  *    unconstrained join — O(n·m) compares; at scale this is the
  *    job that never finishes.
  *  - `single-partition-bottleneck` (critical): an exchange
  *    collapsing to ONE partition below a sort/window/aggregate —
  *    the whole cluster waits on one task.
  *  - `unpartitioned-window` (critical): a window function with no
  *    PARTITION BY — all rows stream through one window instance.
  *  - `missing-pushdown` (warn): a parquet scan with data filters
  *    attached but nothing pushed to the reader — every row is
  *    decoded before filtering; usually a non-pushable expression
  *    wrapping the column.
  *  - `codegen-gap` (info): operators outside WholeStageCodegen
  *    spans — interpreted row-at-a-time execution on the hot path.
  *
  * Two audit points:
  *  - [[audit]] lints the INITIAL plan (pre-execution) — the shape a
  *    reviewer reasons about before submitting.
  *  - [[auditAdaptive]] executes the query and re-lints the
  *    AQE-FINAL plan (materialized query stages expanded), then
  *    diffs: AQE's runtime decisions — broadcast demotions, skew
  *    splits, coalesced readers — are re-graded, not trusted blind.
  *    A plan that was clean on paper but demoted a broadcast join to
  *    SMJ at runtime shows up here and nowhere else.
  */
object PlanAudit {

  case class Finding(rule: String, severity: String, node: String,
                     detail: String)

  /** Initial-plan audit (does not execute the query). */
  def audit(df: DataFrame): Seq[Finding] = auditPlan(initialPlan(df))

  private def initialPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      // pre-execution, the adaptive root's current plan IS the
      // initial plan — the shape a reviewer reasons about
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** Pre-order walk that, unlike `SparkPlan.collect`, descends into
    * materialized AQE query stages (QueryStageExec is a leaf to
    * TreeNode) so final-plan audits see the real operators. Reused
    * exchanges are NOT expanded: their subtree executes once at the
    * original site and is audited there.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: QueryStageExec => p +: flatten(q.plan)
    case _: ReusedExchangeExec => Seq(p)
    case _ => p +: p.children.flatMap(flatten)
  }

  private def auditPlan(plan: SparkPlan): Seq[Finding] = {
    val all = flatten(plan)
    val findings = scala.collection.mutable.ListBuffer.empty[Finding]

    all.foreach {
      case j: CartesianProductExec =>
        findings += Finding("cartesian-product", "critical",
          j.nodeName, "unconstrained O(n*m) join")
      case j: BroadcastNestedLoopJoinExec =>
        // a BNLJ against a provably tiny broadcast side is the RIGHT
        // plan (scalar cross joins, literal probe lists): a
        // no-grouping aggregate guarantees one row, a LocalTableScan
        // is a driver literal — neither grows with the data
        val build = if (j.buildSide.toString == "BuildLeft") j.left else j.right
        val tiny = flatten(build).exists {
          case a: BaseAggregateExec => a.groupingExpressions.isEmpty
          case _: org.apache.spark.sql.execution.LocalTableScanExec => true
          case _ => false
        }
        findings += Finding("broadcast-nested-loop",
          if (tiny) "info" else "warn", j.nodeName,
          if (tiny) s"tiny broadcast side (scalar/literal) — intended (${j.joinType})"
          else "per-row scan of the broadcast side — fine ONLY if that " +
            s"side is contractually small (${j.joinType})")
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        // a single-partition exchange fed by a no-grouping PARTIAL
        // aggregate moves one row per upstream partition — the normal
        // scalar-result shape, benign no matter what sits above it.
        // Anything else collapsing to one partition under a
        // sort/window/grouped-aggregate serializes the job
        val scalarFeed = stripWrappers(e.child) match {
          case a: BaseAggregateExec => a.groupingExpressions.isEmpty
          case _ => false
        }
        findings += Finding("single-partition-bottleneck",
          if (!scalarFeed && parentIsWide(plan, e)) "critical" else "info",
          e.nodeName, "exchange to one partition")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        findings += Finding("unpartitioned-window", "critical",
          w.nodeName, "window with no PARTITION BY — one task does all rows")
      case s: FileSourceScanExec if {
        // join-generated IsNotNull guards don't count on EITHER side:
        // flag only when a REAL predicate exists and nothing real
        // reached the reader
        val real = s.dataFilters.filterNot(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull])
        real.nonEmpty && !s.metadata.get("PushedFilters").exists(p =>
          p.stripPrefix("[").stripSuffix("]").split(",")
            .map(_.trim).exists(f => f.nonEmpty && !f.startsWith("IsNotNull")))
      } =>
        findings += Finding("missing-pushdown", "warn", s.nodeName,
          "data filter(s) evaluated above the reader; usually a " +
            "non-pushable expression wraps the column")
      case _ =>
    }

    // codegen coverage: operators outside any WholeStageCodegen span
    val inCodegen = all.collect { case w: WholeStageCodegenExec =>
      w.collect { case p => p }
    }.flatten.toSet
    val interpreted = all.filterNot(inCodegen)
      .filterNot(_.isInstanceOf[WholeStageCodegenExec])
      .collect {
        case p if p.children.nonEmpty &&
          !p.nodeName.contains("InputAdapter") &&
          !p.nodeName.contains("Exchange") &&
          !p.nodeName.contains("AdaptiveSparkPlan") &&
          !p.nodeName.contains("QueryStage") &&
          !p.nodeName.contains("AQEShuffleRead") &&
          !p.nodeName.contains("ResultQueryStage") => p.nodeName
      }
    if (interpreted.nonEmpty) {
      findings += Finding("codegen-gap", "info",
        interpreted.distinct.mkString(","),
        s"${interpreted.size} operator(s) run interpreted")
    }
    findings.toSeq
  }

  /** Does a Sort/Window/grouped-aggregate sit anywhere above this
    * exchange? (A global no-grouping aggregate over one partition is
    * the normal scalar-result shape, so only GROUPed aggregates count
    * as wide.)
    */
  private def parentIsWide(root: SparkPlan, target: SparkPlan): Boolean = {
    def isWide(p: SparkPlan): Boolean = p match {
      case _: SortExec | _: WindowExec => true
      case a: BaseAggregateExec => a.groupingExpressions.nonEmpty
      case _ => false
    }
    def walk(p: SparkPlan, above: Boolean): Boolean = {
      if (p eq target) above
      else childrenOf(p).exists(walk(_, above || isWide(p)))
    }
    walk(root, above = false)
  }

  /** Unwraps codegen/adapter/stage shells so structural checks see
    * the real operator (final plans wrap everything in
    * WholeStageCodegen; initial plans don't).
    */
  private def stripWrappers(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => stripWrappers(w.child)
    case i: org.apache.spark.sql.execution.InputAdapter => stripWrappers(i.child)
    case q: QueryStageExec => stripWrappers(q.plan)
    case _ => p
  }

  private def childrenOf(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: QueryStageExec => Seq(q.plan)
    case _: ReusedExchangeExec => Nil
    case _ => p.children
  }

  // ---------------------------------------------------------------
  // AQE-final audit
  // ---------------------------------------------------------------

  /** Initial-vs-final audit of one query. `joinMixInitial/Final` are
    * join-operator counts (e.g. BroadcastHashJoin → 2) so a runtime
    * broadcast demotion (BHJ count down, SMJ/SHJ count up) is visible
    * even though AQE rewrites node positions; `skewSplits` counts
    * AQE shuffle readers that applied skew-split partition specs.
    */
  case class AdaptiveAudit(
      initial: Seq[Finding],
      finalFindings: Seq[Finding],
      joinMixInitial: Map[String, Int],
      joinMixFinal: Map[String, Int],
      skewSplits: Int,
      coalescedReads: Int) {
    def planChanged: Boolean = joinMixInitial != joinMixFinal ||
      skewSplits > 0 || coalescedReads > 0
    /** AQE decisions that changed a join strategy, e.g.
      * "BroadcastHashJoin 1->0" + "SortMergeJoin 0->1" = demotion.
      */
    def joinChanges: Seq[String] = {
      val keys = (joinMixInitial.keySet ++ joinMixFinal.keySet).toSeq.sorted
      keys.flatMap { k =>
        val (a, b) = (joinMixInitial.getOrElse(k, 0), joinMixFinal.getOrElse(k, 0))
        if (a != b) Some(s"$k $a->$b") else None
      }
    }
    /** AQE's runtime decisions as findings. A broadcast DEMOTION
      * (fewer BroadcastHashJoins at runtime than on paper) is a warn:
      * the shuffle the reviewer thought was avoided is back.
      * Promotions, skew splits and coalesced readers are info — AQE
      * improving on the initial plan.
      */
    def decisions: Seq[Finding] = {
      val joins = joinChanges.map { ch =>
        val demoted = ch.startsWith("BroadcastHashJoin") && {
          val parts = ch.split(" ").last.split("->")
          parts(1).toInt < parts(0).toInt
        }
        Finding("aqe-join-change", if (demoted) "warn" else "info",
          ch.split(" ").head,
          if (demoted) s"runtime broadcast demotion: $ch — the avoided shuffle is back"
          else s"runtime join re-plan: $ch")
      }
      val skew = if (skewSplits > 0)
        Seq(Finding("aqe-skew-split", "info", "AQEShuffleRead",
          s"$skewSplits reader(s) split skewed partitions")) else Nil
      val coal = if (coalescedReads > 0)
        Seq(Finding("aqe-coalesced-read", "info", "AQEShuffleRead",
          s"$coalescedReads reader(s) coalesced small partitions")) else Nil
      joins ++ skew ++ coal
    }
  }

  private def joinMix(plan: SparkPlan): Map[String, Int] =
    flatten(plan).collect {
      case _: BroadcastHashJoinExec => "BroadcastHashJoin"
      case _: SortMergeJoinExec => "SortMergeJoin"
      case _: ShuffledHashJoinExec => "ShuffledHashJoin"
      case _: BroadcastNestedLoopJoinExec => "BroadcastNestedLoopJoin"
      case _: CartesianProductExec => "CartesianProduct"
    }.groupBy(identity).view.mapValues(_.size).toMap

  /** Executes the query (materializing every AQE stage), then audits
    * the FINAL adaptive plan and diffs it against the initial one.
    * Runtime cost: one full execution of the query (results are
    * consumed on the executors, never collected to the driver).
    */
  def auditAdaptive(df: DataFrame): AdaptiveAudit = {
    val qe = df.queryExecution
    val init = initialPlan(df)
    val initFindings = auditPlan(init)
    val initMix = joinMix(init)
    // materialize: runs the plan; AQE replans stage-by-stage as
    // runtime statistics arrive, then pins the final plan
    qe.toRdd.count()
    val fin = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val reads = flatten(fin).collect { case r: AQEShuffleReadExec => r }
    AdaptiveAudit(
      initial = initFindings,
      finalFindings = auditPlan(fin),
      joinMixInitial = initMix,
      joinMixFinal = joinMix(fin),
      skewSplits = reads.count(_.hasSkewedPartition),
      coalescedReads = reads.count(r => r.hasCoalescedPartition && !r.hasSkewedPartition))
  }

  /** Distinct parquet scans in the EXECUTED final plan whose read
    * path contains `table` — reused exchanges not re-counted. The
    * one-scan gate for self-joining analytics (text_drift, lm_score):
    * if exchange reuse ever stops deduplicating the shared subtree,
    * this count jumps from 1 to the number of consumers, and at
    * 100 TB that is N corpus rescans. The query must already have
    * been executed (e.g. via [[auditAdaptive]] or an action).
    */
  def executedScansOf(df: DataFrame, table: String): Int = {
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    flatten(fin).count {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.exists(_.toString.contains(table))
      case _ => false
    }
  }

  /** The audit as rows, for report pipelines and the contract query. */
  def report(spark: SparkSession, df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("rule", StringType), StructField("severity", StringType),
      StructField("node", StringType), StructField("detail", StringType)))
    val rows = audit(df).map(f => Row(f.rule, f.severity, f.node, f.detail))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
  }
}

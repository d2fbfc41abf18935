package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
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
  * Detection walks the executed plan (including AQE-planned
  * subtrees via `collectWithSubqueries`-style recursion on already
  * materialized query stages is NOT attempted — the audit runs on
  * the initial physical plan, the shape a reviewer reasons about).
  */
object PlanAudit {

  case class Finding(rule: String, severity: String, node: String,
                     detail: String)

  def audit(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.executedPlan match {
      // pre-execution, the adaptive root's current plan IS the
      // initial plan — the shape a reviewer reasons about
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val all = plan.collect { case p => p }
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
        val tiny = build.exists {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
            a.groupingExpressions.isEmpty
          case _: org.apache.spark.sql.execution.LocalTableScanExec => true
          case _ => false
        }
        findings += Finding("broadcast-nested-loop",
          if (tiny) "info" else "warn", j.nodeName,
          if (tiny) s"tiny broadcast side (scalar/literal) — intended (${j.joinType})"
          else "per-row scan of the broadcast side — fine ONLY if that " +
            s"side is contractually small (${j.joinType})")
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        val wide = e.find {
          case _: SortExec | _: WindowExec => true
          case _ => false
        }
        // a single-partition exchange under a LIMIT-style collect is
        // fine; under a sort/window it serializes the job
        findings += Finding("single-partition-bottleneck",
          if (parentIsWide(plan, e)) "critical" else "info",
          e.nodeName, s"exchange to one partition${wide.fold("")(_ => "")}")
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
          !p.nodeName.contains("QueryStage") => p.nodeName
      }
    if (interpreted.nonEmpty) {
      findings += Finding("codegen-gap", "info",
        interpreted.distinct.mkString(","),
        s"${interpreted.size} operator(s) run interpreted")
    }
    findings.toSeq
  }

  /** Does a Sort/Window sit anywhere above this exchange? */
  private def parentIsWide(root: SparkPlan, target: SparkPlan): Boolean = {
    def walk(p: SparkPlan, above: Boolean): Boolean = {
      if (p eq target) above
      else p.children.exists(walk(_,
        above || p.isInstanceOf[SortExec] || p.isInstanceOf[WindowExec]))
    }
    walk(root, above = false)
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

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}

/** Optimizer rule: push KEY-column predicates through the graft
  * custom operators.
  *
  * Catalyst's `PushDownPredicates` only descends through nodes it
  * knows, so a `Filter` above [[TopKPerKeyNode]] or [[AsOfJoinNode]]
  * stops cold — the scan reads and the operator processes every key,
  * and the filter discards most of the work afterwards. Both
  * operators compute INDEPENDENTLY per key (top-k within a key never
  * looks at another key; an as-of match pairs rows of one key only),
  * so any deterministic predicate over only the key columns commutes
  * with them:
  *
  *  - TopKPerKey: the predicate drops whole key groups; the surviving
  *    groups' top-k rows are identical either side of the operator.
  *  - AsOfJoin: the output's key columns come from the left side, so
  *    the predicate maps to both children — a right row whose key is
  *    filtered out could only have matched a left row that is also
  *    filtered out.
  *
  * Pushed predicates land directly above the children, where
  * `PhysicalOperation` collects them through any Project chain into
  * the parquet scan (`PushedFilters` + partition pruning) — at 100 TB
  * the difference between scanning one key's files and all of them.
  * Non-key or non-deterministic conjuncts stay above the operator.
  */
object PushFilterThroughGraftNodes extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, t: TopKPerKeyNode) =>
      val keyAttrs = AttributeSet(
        t.child.output.filter(a => t.keyCols.contains(a.name)))
      val (push, keep) = conjuncts(cond)
        .partition(p => p.deterministic && p.references.nonEmpty &&
          p.references.subsetOf(keyAttrs))
      if (push.isEmpty) f
      else {
        val pushed = t.copy(child = Filter(push.reduce(And), t.child))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }

    case f @ Filter(cond, j: AsOfJoinNode) =>
      val leftKeyAttrs = AttributeSet(
        j.left.output.filter(a => j.keyCols.contains(a.name)))
      val (push, keep) = conjuncts(cond)
        .partition(p => p.deterministic && p.references.nonEmpty &&
          p.references.subsetOf(leftKeyAttrs))
      if (push.isEmpty) f
      else {
        val leftPred = push.reduce(And)
        val rightByName = j.right.output.map(a => a.name -> a).toMap
        val rightPred = leftPred.transform {
          case a: AttributeReference if leftKeyAttrs.contains(a) =>
            rightByName(a.name)
        }
        val pushed = j.copy(
          left = Filter(leftPred, j.left),
          right = Filter(rightPred, j.right))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object GraftOptimizations {
  /** Idempotently add the pushdown rule to a session (the call-time
    * twin of `GraftExtensions`' build-time injection).
    */
  def ensureRule(spark: ClassicSparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughGraftNodes)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughGraftNodes
    }
  }
}

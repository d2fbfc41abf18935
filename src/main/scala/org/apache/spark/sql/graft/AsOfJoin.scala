package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of (point-in-time) join as a first-class operator.
  *
  * For each LEFT row, attach the single RIGHT row with the same key
  * and the greatest time <= the left row's time (right columns null
  * when no such row exists). The window-over-union composition
  * (`q16_asof_join`) interleaves both streams through one window;
  * this exec instead co-partitions both sides on the key
  * (`requiredChildDistribution`), asks for (key, time) ordering
  * (`requiredChildOrdering` — Spark only sorts if needed), and then
  * streams BOTH sorted sides in one forward pass per partition:
  * no row explosion, no range-join quadratic blowup, memory O(1)
  * beyond the two iterators.
  *
  * Time columns compare lexicographically, so (ts, id) tie-breaks
  * work naturally.
  */
case class AsOfJoinNode(keyCols: Seq[String], leftTimeCols: Seq[String],
                        rightTimeCols: Seq[String],
                        left: LogicalPlan, right: LogicalPlan,
                        tolerance: Option[Long] = None) extends BinaryNode {
  // the right side's key columns are equal to the left's (or null on
  // no-match) — drop them from the output like a USING join, so the
  // result has no ambiguous references
  override def output: Seq[Attribute] =
    left.output ++ right.output.filterNot(a => keyCols.contains(a.name))
      .map(_.withNullability(true))
  override def references: AttributeSet = AttributeSet(
    left.output.filter(a => keyCols.contains(a.name) || leftTimeCols.contains(a.name)) ++
      right.output.filter(a => keyCols.contains(a.name) || rightTimeCols.contains(a.name)))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(keyCols: Seq[String], leftTimeCols: Seq[String],
                        rightTimeCols: Seq[String],
                        left: SparkPlan, right: SparkPlan,
                        tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.filterNot(a => keyCols.contains(a.name))
      .map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  private def attrs(plan: SparkPlan, names: Seq[String]): Seq[Attribute] =
    names.map(n => plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"AsOfJoin: column '$n' not in ${plan.output.map(_.name)}")))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(attrs(left, keyCols)),
    ClusteredDistribution(attrs(right, keyCols)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (attrs(left, keyCols) ++ attrs(left, leftTimeCols)).map(SortOrder(_, Ascending)),
    (attrs(right, keyCols) ++ attrs(right, rightTimeCols)).map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeyAttrs = attrs(left, keyCols)
    val rKeyAttrs = attrs(right, keyCols)
    val lTimeAttrs = attrs(left, leftTimeCols)
    val rTimeAttrs = attrs(right, rightTimeCols)
    val totalOutput = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // project keys/times into comparable unsafe rows; a single
      // generated ordering (over the left attr schema) compares both
      // sides because the projections share the schema shape
      val lKeyProj = UnsafeProjection.create(lKeyAttrs, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeyAttrs, rightOutput)
      val lTimeProj = UnsafeProjection.create(lTimeAttrs, leftOutput)
      val rTimeProj = UnsafeProjection.create(rTimeAttrs, rightOutput)
      val keyOrd = GenerateOrdering.generate(
        lKeyAttrs.map(SortOrder(_, Ascending)), lKeyAttrs)
      val timeOrd = GenerateOrdering.generate(
        lTimeAttrs.map(SortOrder(_, Ascending)), lTimeAttrs)
      // output excludes the right key columns; bind it against the
      // full joined schema (left ++ right). The right attrs MUST be
      // re-marked nullable here: binding against the child's original
      // non-nullable attrs compiles the null check away and an
      // unmatched left row would read garbage zeros from nullRight
      // instead of nulls.
      val outProj = UnsafeProjection.create(totalOutput,
        leftOutput ++ rightOutput.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOutput.size)
      val joined = new JoinedRow

      val tol = tolerance.getOrElse(Long.MaxValue)
      val bounded = tolerance.isDefined

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadValid = false
        private var lastMatch: InternalRow = _        // copied
        private var lastMatchKey: org.apache.spark.sql.catalyst.expressions.UnsafeRow = _
        private var lastMatchTime = 0L                // first time col (micros)

        private def advanceRight(): Unit = {
          rHeadValid = rIter.hasNext
          rHead = if (rHeadValid) rIter.next() else null
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l).copy() // lTimeProj buffer is reused below
          // consume right rows that are <= (lKey, lTime)
          var continue = rHeadValid
          while (continue) {
            val rKey = rKeyProj(rHead)
            val ck = keyOrd.compare(rKey, lKey)
            if (ck < 0) {
              advanceRight()
              continue = rHeadValid
            } else if (ck == 0 && timeOrd.compare(rTimeProj(rHead), lTime) <= 0) {
              lastMatch = rHead.copy()
              lastMatchKey = rKey.copy()
              if (bounded) lastMatchTime = rTimeProj(rHead).getLong(0)
              advanceRight()
              continue = rHeadValid
            } else {
              continue = false
            }
          }
          val matched = lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0 &&
            (!bounded || lTime.getLong(0) - lastMatchTime <= tol)
          outProj(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(keys, lt, rt, l, r, tol) =>
      AsOfJoinExec(keys, lt, rt, planLater(l), planLater(r), tol) :: Nil
    case _ => Nil
  }
}

/** Public handle. Column-name collisions between the two sides must
  * be resolved by the caller (alias the right side first).
  */
object AsOfJoin {
  /** @param toleranceUs when set, a match older than this many units
    *        of the FIRST time column (which must be a long — e.g.
    *        unix micros) is treated as no-match (right columns null):
    *        pandas merge_asof's `tolerance`.
    */
  def apply(left: DataFrame, right: DataFrame, keyCols: Seq[String],
            leftTimeCols: Seq[String], rightTimeCols: Seq[String],
            toleranceUs: Option[Long] = None): DataFrame = {
    require(leftTimeCols.size == rightTimeCols.size && leftTimeCols.nonEmpty,
      "left/right time column lists must be non-empty and equal length")
    val l = left.asInstanceOf[ClassicDataFrame]
    val r = right.asInstanceOf[ClassicDataFrame]
    // the generated orderings compare projections from both sides, so
    // key/time types must match exactly
    def typesOf(df: ClassicDataFrame, names: Seq[String]) =
      names.map(n => df.schema.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"AsOfJoin: column '$n' missing")).dataType)
    require(typesOf(l, keyCols) == typesOf(r, keyCols),
      "AsOfJoin: key column types must match on both sides")
    require(typesOf(l, leftTimeCols) == typesOf(r, rightTimeCols),
      "AsOfJoin: time column types must match on both sides")
    if (toleranceUs.isDefined)
      require(typesOf(l, leftTimeCols).head == org.apache.spark.sql.types.LongType,
        "AsOfJoin: tolerance needs a long first time column (e.g. unix micros)")
    val spark = l.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    Dataset.ofRows(spark,
      AsOfJoinNode(keyCols, leftTimeCols, rightTimeCols,
        l.logicalPlan, r.logicalPlan, toleranceUs))
  }
}

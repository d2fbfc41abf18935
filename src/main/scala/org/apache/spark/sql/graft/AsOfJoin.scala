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
                        tolerance: Option[Long] = None,
                        direction: String = AsOfJoin.Backward) extends BinaryNode {
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
                        tolerance: Option[Long] = None,
                        direction: String = AsOfJoin.Backward) extends BinaryExecNode {

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
      val fwd = direction == AsOfJoin.Forward
      val nearest = direction == AsOfJoin.Nearest
      // nearest/tolerance need a numeric distance → first time col is
      // a long (enforced at the public API)
      val needTimes = bounded || nearest

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
          // Consume right rows strictly behind this left row. Left
          // rows arrive in ascending (key, time), so a consumed row
          // can never be the backward OR forward match of a later
          // left row. backward/nearest record the trailing candidate
          // as they pass it; forward stops one row earlier (a right
          // row at exactly the left time IS the forward match and
          // must stay as rHead — it may match several left rows).
          var continue = rHeadValid
          while (continue) {
            val rKey = rKeyProj(rHead)
            val ck = keyOrd.compare(rKey, lKey)
            if (ck < 0) {
              advanceRight()
              continue = rHeadValid
            } else if (ck == 0) {
              val ct = timeOrd.compare(rTimeProj(rHead), lTime)
              if (if (fwd) ct < 0 else ct <= 0) {
                if (!fwd) {
                  lastMatch = rHead.copy()
                  lastMatchKey = rKey.copy()
                  if (needTimes) lastMatchTime = rTimeProj(rHead).getLong(0)
                }
                advanceRight()
                continue = rHeadValid
              } else continue = false
            } else {
              continue = false
            }
          }
          val backOk = !fwd && lastMatch != null &&
            keyOrd.compare(lastMatchKey, lKey) == 0 &&
            (!bounded || lTime.getLong(0) - lastMatchTime <= tol)
          val fwdOk = (fwd || nearest) && rHeadValid &&
            keyOrd.compare(rKeyProj(rHead), lKey) == 0 &&
            (!bounded || rTimeProj(rHead).getLong(0) - lTime.getLong(0) <= tol)
          val chosen =
            if (nearest) {
              if (backOk && fwdOk) {
                // tie → backward (the earlier row), deterministic
                val db = lTime.getLong(0) - lastMatchTime
                val df = rTimeProj(rHead).getLong(0) - lTime.getLong(0)
                if (db <= df) lastMatch else rHead
              } else if (backOk) lastMatch
              else if (fwdOk) rHead
              else nullRight
            } else if (fwd) { if (fwdOk) rHead else nullRight }
            else { if (backOk) lastMatch else nullRight }
          outProj(joined(l, chosen))
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
    case AsOfJoinNode(keys, lt, rt, l, r, tol, dir) =>
      AsOfJoinExec(keys, lt, rt, planLater(l), planLater(r), tol, dir) :: Nil
    case _ => Nil
  }
}

/** Public handle. Column-name collisions between the two sides must
  * be resolved by the caller (alias the right side first).
  */
object AsOfJoin {
  /** Match the greatest right time <= the left time (the default). */
  val Backward = "backward"
  /** Match the smallest right time >= the left time. */
  val Forward = "forward"
  /** Match the right time minimizing |right - left| over the first
    * time column (which must be a long); equidistant candidates
    * resolve to the earlier (backward) row. pandas merge_asof's
    * `direction='nearest'`.
    */
  val Nearest = "nearest"

  /** @param toleranceUs when set, a match farther than this many units
    *        of the FIRST time column (which must be a long — e.g.
    *        unix micros) from the left time is treated as no-match
    *        (right columns null): pandas merge_asof's `tolerance`.
    *        Applies in the match direction (both for `nearest`).
    * @param direction [[Backward]] (default), [[Forward]], or
    *        [[Nearest]].
    */
  def apply(left: DataFrame, right: DataFrame, keyCols: Seq[String],
            leftTimeCols: Seq[String], rightTimeCols: Seq[String],
            toleranceUs: Option[Long] = None,
            direction: String = Backward): DataFrame = {
    require(leftTimeCols.size == rightTimeCols.size && leftTimeCols.nonEmpty,
      "left/right time column lists must be non-empty and equal length")
    require(Set(Backward, Forward, Nearest).contains(direction),
      s"AsOfJoin: unknown direction '$direction'")
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
    if (toleranceUs.isDefined || direction == Nearest)
      require(typesOf(l, leftTimeCols).head == org.apache.spark.sql.types.LongType,
        "AsOfJoin: tolerance/nearest need a long first time column (e.g. unix micros)")
    val spark = l.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    GraftOptimizations.ensureRule(spark)
    Dataset.ofRows(spark,
      AsOfJoinNode(keyCols, leftTimeCols, rightTimeCols,
        l.logicalPlan, r.logicalPlan, toleranceUs, direction))
  }
}

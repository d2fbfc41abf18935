package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.SparkSessionExtensions

/** Top-K-per-key as a first-class operator (SURVEY.md §4:
  * custom LogicalPlan + Strategy + SparkPlan).
  *
  * The DataFrame idiom — `row_number().over(Window.partitionBy(key)
  * .orderBy(ord))` then `filter(rn <= k)` — SORTS every partition in
  * full before discarding all but k rows per key, and ships EVERY
  * input row to at most |keys| reducers first. This operator plans as
  * TWO passes, mirroring partial aggregation:
  *
  *  1. a map-side partial pass keeps a bounded heap per key within
  *     each input partition, so at most |partitions|·|keys|·k rows
  *     ever reach the exchange — with low-cardinality keys (ANN
  *     query ids) that is the difference between shuffling the
  *     scored corpus and shuffling k rows per partition;
  *  2. a final pass after the key exchange merges the partial heaps
  *     and optionally emits a dense 1..k rank column.
  *
  * Zero sort in either pass, O(keys·k) memory per task.
  *
  * This file lives under `org.apache.spark.sql` for access to
  * `Dataset.ofRows` (package-private plan→DataFrame constructor) —
  * the standard extension-library technique.
  */
case class TopKPerKeyNode(keyCols: Seq[String], orderCols: Seq[(String, Boolean)],
                          k: Int, rankAttr: Option[AttributeReference],
                          child: LogicalPlan,
                          flushRows: Int = TopKPerKey.DefaultFlushRows) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  // key/order columns are carried by name, so they must be declared
  // as references or ColumnPruning removes them from the child
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(a =>
        keyCols.contains(a.name) || orderCols.exists(_._1 == a.name)))
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keyCols: Seq[String], orderCols: Seq[(String, Boolean)],
                          k: Int, rankAttr: Option[AttributeReference],
                          partial: Boolean, child: SparkPlan,
                          flushRows: Int = TopKPerKey.DefaultFlushRows) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output ++ rankAttr
  override def outputPartitioning: Partitioning = child.outputPartitioning

  private def attr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"TopKPerKey: column '$name' not in ${child.output.map(_.name)}"))

  private def sortOrders: Seq[SortOrder] = orderCols.map { case (name, desc) =>
    SortOrder(attr(name), if (desc) Descending else Ascending)
  }

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keyCols.map(attr)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keyCols.map(attr)
    val orders = sortOrders
    val childOutput = child.output
    val kLocal = k
    val isPartial = partial
    val emitRank = !partial && rankAttr.isDefined
    val finalOutput = output
    val flushLimit = flushRows
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = GenerateOrdering.generate(orders, childOutput)
      // heap keeps the k BEST rows; head = worst retained row, so
      // invert the ordering for the priority queue
      implicit val heapOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => rowOrdering.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      val converter = UnsafeProjection.create(childOutput, childOutput)
      var retained = 0L

      def insert(row: InternalRow): Unit = {
        val unsafe = converter(row)
        val key = keyProj(unsafe)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[UnsafeRow](heapOrd))
        if (heap.size < kLocal) { heap.enqueue(unsafe.copy()); retained += 1 }
        else if (rowOrdering.compare(unsafe, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(unsafe.copy())
        }
      }

      def drain(): Iterator[InternalRow] = {
        val snapshot = heaps.values.toIndexedSeq
        heaps.clear(); retained = 0L
        snapshot.iterator.flatMap(_.dequeueAll.reverseIterator) // best-first per key
      }

      if (isPartial) {
        // incremental: consume input until the flush limit, emit, repeat
        new Iterator[InternalRow] {
          private var cur: Iterator[InternalRow] = Iterator.empty
          @annotation.tailrec
          override def hasNext: Boolean = cur.hasNext || (iter.hasNext && {
            while (iter.hasNext && retained < flushLimit) insert(iter.next())
            cur = drain()
            hasNext
          })
          override def next(): InternalRow = cur.next()
        }
      } else {
        iter.foreach(insert)
        if (!emitRank) drain()
        else {
          val joined = new JoinedRow
          val rankRow = new GenericInternalRow(1)
          val project = UnsafeProjection.create(finalOutput, finalOutput)
          heaps.iterator.flatMap { case (_, heap) =>
            val best: Seq[UnsafeRow] = heap.dequeueAll
            best.reverseIterator.zipWithIndex.map { case (row, i) =>
              rankRow.setLong(0, i + 1L)
              project(joined(row, rankRow))
            }
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, orders, k, rankAttr, child, flushRows) =>
      val partialPass = TopKPerKeyExec(keys, orders, k, None,
        partial = true, planLater(child), flushRows)
      TopKPerKeyExec(keys, orders, k, rankAttr, partial = false, partialPass, flushRows) :: Nil
    case _ => Nil
  }
}

/** Public handle: `TopKPerKey(df, Seq("query_id"), Seq("cosine" -> true,
  * "base_id" -> false), 5)` → the k best rows per key under the given
  * (column, descending?) ordering, best-first within each key;
  * `rankCol = Some("rank")` appends the 1..k position as a bigint.
  *
  * Note: the node passes through ALL child columns (`output =
  * child.output`), so projections above it do not prune the child
  * scan — select the needed columns BEFORE calling.
  */
object TopKPerKey {

  /** Partial-pass memory bound: once the retained row count crosses
    * this, the current heaps are flushed downstream and rebuilt — the
    * final pass re-reduces, so over-emission is always safe. Keeps
    * high-cardinality keys from buffering a whole input partition.
    */
  val DefaultFlushRows: Int = 1 << 20

  def apply(df: DataFrame, keyCols: Seq[String],
            orderCols: Seq[(String, Boolean)], k: Int,
            rankCol: Option[String] = None,
            flushRows: Int = DefaultFlushRows): DataFrame = {
    require(k > 0, "k must be positive")
    val classic = df.asInstanceOf[ClassicDataFrame]
    val spark = classic.sparkSession
    ensureStrategy(spark)
    val rankAttr = rankCol.map(n => AttributeReference(n, LongType, nullable = false)())
    Dataset.ofRows(spark,
      TopKPerKeyNode(keyCols, orderCols, k, rankAttr, classic.logicalPlan, flushRows))
  }

  /** Idempotently add the planning strategy + pushdown rule to a session. */
  def ensureStrategy(spark: ClassicSparkSession): Unit = {
    val ss = spark.sessionState
    if (!ss.planner.extraPlanningStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    GraftOptimizations.ensureRule(spark)
  }

  /** For SparkSessionExtensions-based registration. */
  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => PushFilterThroughGraftNodes)
  }
}

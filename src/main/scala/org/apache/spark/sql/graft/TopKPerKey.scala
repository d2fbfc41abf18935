package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.SparkSessionExtensions

/** Top-K-per-key as a first-class operator (SURVEY.md §4:
  * custom LogicalPlan + Strategy + SparkPlan).
  *
  * The DataFrame idiom — `row_number().over(Window.partitionBy(key)
  * .orderBy(ord))` then `filter(rn <= k)` — SORTS every partition in
  * full before discarding all but k rows per key. This operator keeps
  * a bounded heap per key instead: one shuffle on the key (enforced
  * via `requiredChildDistribution`), zero sort, O(keys·k) memory.
  * At 100 TB the difference is a full sort of the fact table vs a
  * streaming pass.
  *
  * This file lives under `org.apache.spark.sql` for access to
  * `Dataset.ofRows` (package-private plan→DataFrame constructor) —
  * the standard extension-library technique.
  */
case class TopKPerKeyNode(keyCols: Seq[String], orderCols: Seq[(String, Boolean)],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
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
                          k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  private def attr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"TopKPerKey: column '$name' not in ${child.output.map(_.name)}"))

  private def sortOrders: Seq[SortOrder] = orderCols.map { case (name, desc) =>
    SortOrder(attr(name), if (desc) Descending else Ascending)
  }

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyCols.map(attr)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keyCols.map(attr)
    val orders = sortOrders
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = GenerateOrdering.generate(orders, childOutput)
      // heap keeps the k BEST rows; head = worst retained row, so
      // invert the ordering for the priority queue
      implicit val heapOrd: Ordering[UnsafeRow] =
        (a: UnsafeRow, b: UnsafeRow) => rowOrdering.compare(a, b)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      val converter = UnsafeProjection.create(childOutput, childOutput)
      iter.foreach { row =>
        val unsafe = converter(row)
        val key = keyProj(unsafe)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[UnsafeRow](heapOrd))
        if (heap.size < kLocal) heap.enqueue(unsafe.copy())
        else if (rowOrdering.compare(unsafe, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(unsafe.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator // emit best-first per key
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, orders, k, child) =>
      TopKPerKeyExec(keys, orders, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Public handle: `TopKPerKey(df, Seq("query_id"), Seq("cosine" -> true,
  * "base_id" -> false), 5)` → the k best rows per key under the given
  * (column, descending?) ordering, best-first within each key.
  *
  * Note: the node passes through ALL child columns (`output =
  * child.output`), so projections above it do not prune the child
  * scan — select the needed columns BEFORE calling.
  */
object TopKPerKey {

  def apply(df: DataFrame, keyCols: Seq[String],
            orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val classic = df.asInstanceOf[ClassicDataFrame]
    val spark = classic.sparkSession
    ensureStrategy(spark)
    Dataset.ofRows(spark, TopKPerKeyNode(keyCols, orderCols, k, classic.logicalPlan))
  }

  /** Idempotently add the planning strategy to a session. */
  def ensureStrategy(spark: ClassicSparkSession): Unit = {
    val ss = spark.sessionState
    if (!ss.planner.extraPlanningStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
  }

  /** For SparkSessionExtensions-based registration. */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
}

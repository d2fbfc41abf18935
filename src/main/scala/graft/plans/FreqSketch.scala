package graft.plans

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items (heavy hitters) sketches — the third
  * member of the sketch family beside distinct-count (q45 HLL) and
  * point-frequency (q48 CMS): "WHICH items are frequent", answered
  * from model-sized state (SURVEY §2b row 33i5).
  *
  * CMS answers "how often does key X occur?" but only for keys you
  * already know to ask about; a frequent-items sketch RECOVERS the
  * heavy keys themselves. At 100 TB that is the skew detector (which
  * join keys need salting), the hot-token monitor, and the
  * top-domains report — all from per-partition/per-group sketches
  * that compose by union, one pass over raw data ever.
  *
  * Backed by the Apache Datasketches Misra-Gries style ItemsSketch:
  * estimates obey `est - maxError <= true <= est` per item, and
  * `getFrequentItems(NO_FALSE_NEGATIVES)` returns a superset of every
  * item with true count > maxError (maxError <= 3.5 * n / maxMapSize).
  * The specs pin both guarantees against exact counts.
  *
  * [[FreqAggregate]] sketches raw string values (leaf level);
  * [[FreqUnionAgg]] merges sketch binaries (rollup level);
  * [[FreqTopItems]] recovers the top-k heavy items with bounds;
  * [[FreqEstimate]] point-probes one item (streaming-upkeep parity
  * with the CMS plug-in shape).
  */
object Freq {
  /** Power of 2; sketch keeps ~0.75*maxMapSize counters. */
  val DefaultMaxMapSize = 1024

  private[plans] val serDe = new ArrayOfStringsSerDe()

  /** Leaf aggregate: sketch of raw string values. */
  def sketch(c: Column, maxMapSize: Int = DefaultMaxMapSize): Column =
    ColumnBridge.column(FreqAggregate(ColumnBridge.expression(c),
      maxMapSize).toAggregateExpression())

  /** Rollup aggregate: union of sketch binaries. */
  def union(c: Column, maxMapSize: Int = DefaultMaxMapSize): Column =
    ColumnBridge.column(FreqUnionAgg(ColumnBridge.expression(c),
      maxMapSize).toAggregateExpression())

  /** Top-k heavy items of a sketch binary, descending estimate:
    * array<struct<item, estimate, lower, upper>>.
    */
  def topItems(sk: Column, k: Int): Column =
    ColumnBridge.column(FreqTopItems(ColumnBridge.expression(sk), k))

  /** Point estimate of `item`'s frequency in a sketch binary. */
  def estimate(sk: Column, item: Column): Column =
    ColumnBridge.column(FreqEstimate(ColumnBridge.expression(sk),
      ColumnBridge.expression(item)))

  private[plans] def fromBytes(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)
}

abstract class FreqAggBase extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {
  def maxMapSize: Int

  final override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  final override def merge(buffer: ItemsSketch[String],
                           input: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(input); buffer
  }

  final override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(Freq.serDe)

  final override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(Freq.serDe)

  final override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    Freq.fromBytes(bytes)

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = false
}

case class FreqAggregate(child: Expression, maxMapSize: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends FreqAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def prettyName: String = "graft_freq_sketch"
  override def withNewMutableAggBufferOffset(o: Int): FreqAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqAggregate =
    copy(child = c)
}

case class FreqUnionAgg(child: Expression, maxMapSize: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0) extends FreqAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch input, got ${other.simpleString}")
  }

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.merge(Freq.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def prettyName: String = "graft_freq_union"
  override def withNewMutableAggBufferOffset(o: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqUnionAgg =
    copy(child = c)
}

/** Top-k heavy items with per-item bounds. NO_FALSE_NEGATIVES: the
  * result is a superset of every item whose true count exceeds the
  * sketch's maximum error, then capped to the k largest estimates.
  * Deserializes per row — rollup-level only, CodegenFallback is
  * deliberate (same stance as [[CmsEstimate]]).
  */
case class FreqTopItems(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k > 0, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower", LongType, nullable = false),
    StructField("upper", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_freq_top_items"

  override def nullSafeEval(sk: Any): Any = {
    val sketch = Freq.fromBytes(sk.asInstanceOf[Array[Byte]])
    val rows = sketch.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k)
      .map { r =>
        InternalRow(UTF8String.fromString(r.getItem), r.getEstimate,
          r.getLowerBound, r.getUpperBound)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): FreqTopItems =
    copy(child = c)
}

/** `getEstimate` of one item in a serialized sketch — the probe shape
  * the streaming sketch-upkeep plug-in uses (rollup-level rows only).
  */
case class FreqEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, string item), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_freq_estimate"

  override def nullSafeEval(sk: Any, item: Any): Any =
    Freq.fromBytes(sk.asInstanceOf[Array[Byte]])
      .getEstimate(item.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

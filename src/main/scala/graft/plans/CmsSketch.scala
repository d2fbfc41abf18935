package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable count-min sketches — the frequency twin of the q45 HLL
  * distinct-count pair (SURVEY §2b row 33i2).
  *
  * A 100 TB warehouse stores per-partition/per-group sketches as the
  * pre-aggregation and answers "how often does key X occur in any
  * rollup of these groups?" by sketch UNION — one pass over raw data
  * ever, point-estimates from model-sized state afterwards. Exact
  * per-key counts can't compose this way without keeping every key.
  *
  * [[CmsAggregate]] builds a sketch from raw values (leaf level);
  * [[CmsUnionAgg]] merges already-built sketch binaries (rollup
  * level). Both sides hash through the SAME byte representation
  * (UTF-8 bytes for strings, the long value for integral types), so
  * [[CmsEstimate]] probes agree with what was added. CMS guarantees
  * estimate >= true count, and estimate <= true count + eps * N with
  * probability `confidence` — the spec pins both bounds.
  *
  * All three sketch parties must share (eps, confidence, seed):
  * `mergeInPlace` rejects incompatible geometries.
  */
object Cms {
  val DefaultEps = 0.005
  val DefaultConfidence = 0.99
  val DefaultSeed = 42

  /** Leaf aggregate: sketch of raw string/long values. */
  def sketch(c: Column, eps: Double = DefaultEps,
             confidence: Double = DefaultConfidence,
             seed: Int = DefaultSeed): Column =
    ColumnBridge.column(CmsAggregate(ColumnBridge.expression(c),
      eps, confidence, seed).toAggregateExpression())

  /** Rollup aggregate: union of sketch binaries. */
  def union(c: Column, eps: Double = DefaultEps,
            confidence: Double = DefaultConfidence,
            seed: Int = DefaultSeed): Column =
    ColumnBridge.column(CmsUnionAgg(ColumnBridge.expression(c),
      eps, confidence, seed).toAggregateExpression())

  /** Point estimate of `item`'s frequency in a sketch binary. */
  def estimate(sk: Column, item: Column): Column =
    ColumnBridge.column(CmsEstimate(ColumnBridge.expression(sk),
      ColumnBridge.expression(item)))

  private[plans] def addTo(sketch: CountMinSketch, dt: DataType,
                           v: Any): Unit = dt match {
    case StringType => sketch.addBinary(v.asInstanceOf[UTF8String].getBytes)
    case LongType => sketch.addLong(v.asInstanceOf[Long])
    case IntegerType => sketch.addLong(v.asInstanceOf[Int].toLong)
    case other => throw new IllegalArgumentException(
      s"cms_sketch: unsupported input type ${other.simpleString}")
  }
}

abstract class CmsAggBase extends TypedImperativeAggregate[CountMinSketch]
  with UnaryLike[Expression] {
  def eps: Double
  def confidence: Double
  def seed: Int

  final override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  final override def merge(buffer: CountMinSketch,
                           input: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(input); buffer
  }

  final override def eval(buffer: CountMinSketch): Any =
    buffer.toByteArray

  final override def serialize(buffer: CountMinSketch): Array[Byte] =
    buffer.toByteArray

  final override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(bytes)

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = false
}

case class CmsAggregate(child: Expression, eps: Double, confidence: Double,
                        seed: Int, mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0) extends CmsAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string/long/int input, got ${other.simpleString}")
  }

  override def update(buffer: CountMinSketch,
                      input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) Cms.addTo(buffer, child.dataType, v)
    buffer
  }

  override def prettyName: String = "graft_cms_sketch"
  override def withNewMutableAggBufferOffset(o: Int): CmsAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsAggregate =
    copy(child = c)
}

case class CmsUnionAgg(child: Expression, eps: Double, confidence: Double,
                       seed: Int, mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0) extends CmsAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch input, got ${other.simpleString}")
  }

  override def update(buffer: CountMinSketch,
                      input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) {
      buffer.mergeInPlace(CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]]))
    }
    buffer
  }

  override def prettyName: String = "graft_cms_union"
  override def withNewMutableAggBufferOffset(o: Int): CmsUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsUnionAgg =
    copy(child = c)
}

/** `estimateCount` over a serialized sketch. Deserializes per row —
  * meant for rollup-level rows (a handful of groups), never inside a
  * raw scan; the CodegenFallback is deliberate.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType | LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, string/long/int item), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val sketch = CountMinSketch.readFrom(sk.asInstanceOf[Array[Byte]])
    right.dataType match {
      case StringType =>
        sketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)
      case LongType => sketch.estimateCount(item.asInstanceOf[Long])
      case IntegerType => sketch.estimateCount(item.asInstanceOf[Int].toLong)
      case other => throw new IllegalArgumentException(
        s"$prettyName: unsupported item type ${other.simpleString}")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter aggregate over raw column values — the membership
  * sketch of the mergeable family (HLL answers "how many distinct",
  * this answers "might value X be HERE"). Built per file/group it is
  * the equality-probe skipping index lakehouse formats attach to
  * high-cardinality columns, where min/max envelopes cannot prune
  * (every file's [min,max] spans the whole key space on unsorted
  * data, but each file still holds only its own keys).
  *
  * Values are added via the sketch's own typed paths (long bits,
  * UTF-8 string bytes), so a DRIVER-side `mightContain*` probe with
  * the plain value agrees with what executors added — no dependence
  * on any engine hash. Union ([[BloomUnionAgg]]) is bitwise OR:
  * associative, commutative, lossless — the same rollup contract as
  * the other sketches (same expectedItems/fpp geometry required).
  */
object Bloom {
  val DefaultFpp = 0.01

  /** Leaf aggregate: Bloom filter binary of raw long/int/string values. */
  def sketch(c: Column, expectedItems: Long, fpp: Double = DefaultFpp): Column =
    ColumnBridge.column(BloomAggregate(ColumnBridge.expression(c),
      expectedItems, fpp).toAggregateExpression())

  /** Rollup aggregate: bitwise-OR union of Bloom binaries. Size the
    * LEAVES for the merged cardinality: OR-ing k filters each filled
    * to its own capacity saturates the bit array and the union's
    * false-positive rate degrades accordingly (the standard Bloom
    * sizing rule; the spec demonstrates both regimes).
    */
  def union(c: Column, expectedItems: Long, fpp: Double = DefaultFpp): Column =
    ColumnBridge.column(BloomUnionAgg(ColumnBridge.expression(c),
      expectedItems, fpp).toAggregateExpression())

  private[graft] def addTo(bf: BloomFilter, dt: DataType, v: Any): Unit =
    dt match {
      case StringType => bf.putBinary(v.asInstanceOf[UTF8String].getBytes)
      case LongType => bf.putLong(v.asInstanceOf[Long])
      case IntegerType => bf.putLong(v.asInstanceOf[Int].toLong)
      case other => throw new IllegalArgumentException(
        s"graft_bloom: unsupported input type ${other.simpleString}")
    }

  /** Driver-side probe matching [[addTo]]'s byte paths. */
  private[graft] def mightContain(bytes: Array[Byte], value: Any): Boolean = {
    val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    value match {
      case s: String => bf.mightContainBinary(s.getBytes("UTF-8"))
      case l: Long => bf.mightContainLong(l)
      case i: Int => bf.mightContainLong(i.toLong)
      case other => throw new IllegalArgumentException(
        s"graft_bloom probe: unsupported value type ${other.getClass}")
    }
  }
}

abstract class BloomAggBase extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] {
  def expectedItems: Long
  def fpp: Double

  final override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  final override def merge(buffer: BloomFilter,
                           input: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(input); buffer
  }

  final override def eval(buffer: BloomFilter): Any = serialize(buffer)

  final override def serialize(buffer: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  final override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = false
}

case class BloomAggregate(child: Expression, expectedItems: Long, fpp: Double,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0) extends BloomAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string/long/int input, got ${other.simpleString}")
  }

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) Bloom.addTo(buffer, child.dataType, v)
    buffer
  }

  override def prettyName: String = "graft_bloom_sketch"
  override def withNewMutableAggBufferOffset(o: Int): BloomAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomAggregate =
    copy(child = c)
}

case class BloomUnionAgg(child: Expression, expectedItems: Long, fpp: Double,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends BloomAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary Bloom input, got ${other.simpleString}")
  }

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.mergeInPlace(
      BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def prettyName: String = "graft_bloom_union"
  override def withNewMutableAggBufferOffset(o: Int): BloomUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomUnionAgg =
    copy(child = c)
}

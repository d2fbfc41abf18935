package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{AnotB, CompactSketch, Intersection, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable theta sketches — distinct counting with SET ALGEBRA
  * (SURVEY §2b row 33i6). HLL (q45) answers "how many distinct in
  * any UNION of segments"; theta sketches additionally answer
  * INTERSECTION and DIFFERENCE: "how many users are in segment A
  * AND segment B" / "in A but not B" — retention, churn, and
  * audience-overlap questions that exact COUNT(DISTINCT) can only
  * answer by rescanning both segments' raw rows.
  *
  * The 100 TB shape: per-segment (per-day/source/cohort) sketches
  * are the stored pre-aggregation, one scan ever; every set-algebra
  * question afterwards composes model-sized binaries. A sketch with
  * nominal entries K keeps at most K hash samples; below K distinct
  * values it is EXACT (theta = 1, no sampling), above it the
  * estimate carries a published relative-error bound surfaced via
  * [[Theta.bounds]] (2 standard deviations).
  *
  * [[ThetaAggregate]] sketches raw values (leaf); [[ThetaUnionAgg]]
  * merges binaries (rollup); [[ThetaIntersect]] / [[ThetaDiff]] are
  * the pairwise set operators over binaries; [[ThetaEstimate]] /
  * [[Theta.bounds]] read estimates out.
  */
object Theta {
  /** Sketch sample budget (power of 2). Exact below this many
    * distincts; 2^18 keeps every test SF in the exact regime while
    * a cluster deployment would drop to 2^12-ish per segment.
    */
  val DefaultNominalEntries = 1 << 18

  /** Leaf aggregate: theta sketch of raw string/long/int values. */
  def sketch(c: Column, nominalEntries: Int = DefaultNominalEntries): Column =
    ColumnBridge.column(ThetaAggregate(ColumnBridge.expression(c),
      nominalEntries).toAggregateExpression())

  /** Rollup aggregate: union of sketch binaries. */
  def union(c: Column, nominalEntries: Int = DefaultNominalEntries): Column =
    ColumnBridge.column(ThetaUnionAgg(ColumnBridge.expression(c),
      nominalEntries).toAggregateExpression())

  /** A ∩ B of two sketch binaries → sketch binary. */
  def intersect(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersect(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** A \ B of two sketch binaries → sketch binary. */
  def aNotB(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaDiff(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Rounded distinct estimate of a sketch binary. */
  def estimate(sk: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sk)))

  /** struct<lower, upper>: the 2-standard-deviation interval. */
  def bounds(sk: Column): Column =
    ColumnBridge.column(ThetaBounds(ColumnBridge.expression(sk)))

  private[plans] def newUnion(nominalEntries: Int): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  private[plans] def wrap(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))

  private[plans] def addTo(u: Union, dt: DataType, v: Any): Unit = dt match {
    case StringType => u.update(v.asInstanceOf[UTF8String].toString)
    case LongType => u.update(v.asInstanceOf[Long])
    case IntegerType => u.update(v.asInstanceOf[Int].toLong)
    case other => throw new IllegalArgumentException(
      s"theta_sketch: unsupported input type ${other.simpleString}")
  }
}

/** Buffer is a theta Union: it accepts raw updates AND sketch merges,
  * and its running state serializes as a compact sketch — exactly the
  * TypedImperativeAggregate contract.
  */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {
  def nominalEntries: Int

  final override def createAggregationBuffer(): Union =
    Theta.newUnion(nominalEntries)

  final override def merge(buffer: Union, input: Union): Union = {
    buffer.union(input.getResult); buffer
  }

  final override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  final override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  final override def deserialize(bytes: Array[Byte]): Union = {
    val u = Theta.newUnion(nominalEntries)
    u.union(Theta.wrap(bytes))
    u
  }

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = false
}

case class ThetaAggregate(child: Expression, nominalEntries: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string/long/int input, got ${other.simpleString}")
  }

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) Theta.addTo(buffer, child.dataType, v)
    buffer
  }

  override def prettyName: String = "graft_theta_sketch"
  override def withNewMutableAggBufferOffset(o: Int): ThetaAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaAggregate =
    copy(child = c)
}

case class ThetaUnionAgg(child: Expression, nominalEntries: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch input, got ${other.simpleString}")
  }

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Theta.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def prettyName: String = "graft_theta_union"
  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** Pairwise set ops over serialized sketches. Rollup-level rows only
  * (a handful of segments), CodegenFallback deliberate — the same
  * stance as [[CmsEstimate]].
  */
abstract class ThetaBinarySetOp extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two binary sketches, " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BinaryType
  protected def compute(a: Sketch, b: Sketch): CompactSketch
  final override def nullSafeEval(a: Any, b: Any): Any =
    compute(Theta.wrap(a.asInstanceOf[Array[Byte]]),
      Theta.wrap(b.asInstanceOf[Array[Byte]])).toByteArray
}

case class ThetaIntersect(left: Expression, right: Expression)
  extends ThetaBinarySetOp {
  override def prettyName: String = "graft_theta_intersect"
  override protected def compute(a: Sketch, b: Sketch): CompactSketch = {
    val i: Intersection = SetOperation.builder().buildIntersection()
    i.intersect(a); i.intersect(b)
    i.getResult
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class ThetaDiff(left: Expression, right: Expression)
  extends ThetaBinarySetOp {
  override def prettyName: String = "graft_theta_a_not_b"
  override protected def compute(a: Sketch, b: Sketch): CompactSketch = {
    val op: AnotB = SetOperation.builder().buildANotB()
    op.setA(a); op.notB(b)
    op.getResult(true)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_theta_estimate"
  override def nullSafeEval(sk: Any): Any =
    math.round(Theta.wrap(sk.asInstanceOf[Array[Byte]]).getEstimate)
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

case class ThetaBounds(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch input, got ${other.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("lower", LongType, nullable = false),
    StructField("upper", LongType, nullable = false)))
  override def prettyName: String = "graft_theta_bounds"
  override def nullSafeEval(sk: Any): Any = {
    val s = Theta.wrap(sk.asInstanceOf[Array[Byte]])
    InternalRow(math.round(math.floor(s.getLowerBound(2))),
      math.round(math.ceil(s.getUpperBound(2))))
  }
  override protected def withNewChildInternal(c: Expression): ThetaBounds =
    copy(child = c)
}

package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable GRAM-MOMENT aggregate over embedding vectors — the
  * covariance analog of the sketch family (HLL/CMS/GK/…): ONE pass
  * over the vectors produces a model-sized moment state
  * `[n, Σx_i (d), Σx_i·x_j (upper triangle, d(d+1)/2)]` from which
  * mean, covariance, and PCA all derive, and two shards' states
  * compose by ELEMENTWISE ADDITION — so per-partition/per-group
  * moments are a stored pre-aggregation that rolls up without ever
  * rescanning raw vectors ([[GramUnionAgg]]).
  *
  * The state is `1 + d + d(d+1)/2` doubles (d=64 → 2 145 doubles,
  * ~17 KB) regardless of corpus size; the per-row update is the
  * honest O(d²) cost of second moments. Double addition is
  * order-dependent across partitionings only at the ulp level —
  * consumers (the PCA eigensolve) are iterative with far larger
  * tolerances.
  */
object Gram {

  /** Moment-state length for dimension `d`. */
  def stateLen(d: Int): Int = 1 + d + d * (d + 1) / 2

  /** Leaf aggregate: moment vector from raw `array<float|double>`
    * embedding rows (vectors shorter than `dim`, or null, are
    * skipped; longer ones use their first `dim` coordinates).
    */
  def moments(vec: Column, dim: Int): Column =
    ColumnBridge.column(GramAggregate(ColumnBridge.expression(vec), dim)
      .toAggregateExpression())

  /** Rollup aggregate: elementwise sum of already-built moment
    * vectors (the union side of the mergeable pair).
    */
  def union(state: Column, dim: Int): Column =
    ColumnBridge.column(GramUnionAgg(ColumnBridge.expression(state), dim)
      .toAggregateExpression())
}

abstract class GramAggBase extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {
  def dim: Int

  final override def createAggregationBuffer(): Array[Double] =
    new Array[Double](Gram.stateLen(dim))

  final override def merge(buffer: Array[Double],
                           input: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += input(i); i += 1 }
    buffer
  }

  final override def eval(buffer: Array[Double]): Any =
    new GenericArrayData(buffer)

  final override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  final override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  final override def dataType: DataType = ArrayType(DoubleType, false)
  final override def nullable: Boolean = false
}

case class GramAggregate(child: Expression, dim: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0) extends GramAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double>, got ${other.simpleString}")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def update(buffer: Array[Double],
                      input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return buffer
    // local copy: one ArrayData read per coordinate, not per product
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return buffer
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buffer(0) += 1.0
    i = 0
    while (i < dim) { buffer(1 + i) += x(i); i += 1 }
    var idx = 1 + dim
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) { buffer(idx) += x(i) * x(j); idx += 1; j += 1 }
      i += 1
    }
    buffer
  }

  override def prettyName: String = "graft_gram_moments"
  override def withNewMutableAggBufferOffset(o: Int): GramAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): GramAggregate =
    copy(child = c)
}

case class GramUnionAgg(child: Expression, dim: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0) extends GramAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> moment state, got ${other.simpleString}")
  }

  override def update(buffer: Array[Double],
                      input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    require(arr.numElements() == buffer.length,
      s"graft_gram_union: state length ${arr.numElements()} does not match " +
        s"dim=$dim (expected ${buffer.length}) — states from a different " +
        "dimension cannot be merged")
    var i = 0
    while (i < buffer.length) { buffer(i) += arr.getDouble(i); i += 1 }
    buffer
  }

  override def prettyName: String = "graft_gram_union"
  override def withNewMutableAggBufferOffset(o: Int): GramUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): GramUnionAgg =
    copy(child = c)
}

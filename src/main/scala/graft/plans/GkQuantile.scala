package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (Greenwald–Khanna) — third member of
  * the sketch family: distinct counts compose via HLL union (q45),
  * frequencies via count-min union (q48), and quantiles via GK
  * summary merge. `percentile_approx` answers one query over one
  * grouping; a STORED per-group GK sketch answers any later quantile
  * over any rollup of the groups without rescanning raw data.
  *
  * Engine-native: the summary structure is Spark's own
  * `QuantileSummaries` (what approxQuantile/percentile_approx use),
  * wrapped in a TypedImperativeAggregate pair ([[GkAgg]] builds from
  * raw doubles, [[GkUnionAgg]] merges serialized sketches) plus a
  * point-query expression ([[GkQuantileOf]]). Serialized form: the
  * (value, g, delta) tuples + count + geometry, a few KB per group
  * at the default 1% relative error.
  *
  * Guarantee (GK invariant, spec-pinned): a φ-quantile estimate's
  * true rank r satisfies |r − φ·n| ≤ eps · n, and the property
  * survives arbitrary merge trees.
  */
object Gk {
  val DefaultEps = 0.01

  def sketch(c: Column, eps: Double = DefaultEps): Column =
    ColumnBridge.column(GkAgg(ColumnBridge.expression(c), eps)
      .toAggregateExpression())

  def union(c: Column): Column =
    ColumnBridge.column(GkUnionAgg(ColumnBridge.expression(c))
      .toAggregateExpression())

  def quantile(sk: Column, phi: Column): Column =
    ColumnBridge.column(GkQuantileOf(ColumnBridge.expression(sk),
      ColumnBridge.expression(phi)))

  private[plans] def compressed(qs: QuantileSummaries): QuantileSummaries =
    if (qs.compressed) qs else qs.compress()

  private[plans] def serialize(qs0: QuantileSummaries): Array[Byte] = {
    val qs = compressed(qs0)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(qs.compressThreshold)
    out.writeDouble(qs.relativeError)
    out.writeLong(qs.count)
    val st = qs.sampled
    out.writeInt(st.length)
    st.foreach { s =>
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
    }
    out.flush()
    bos.toByteArray
  }

  private[plans] def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ct = in.readInt()
    val re = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val st = Array.fill(n)(Stats(in.readDouble(), in.readLong(), in.readLong()))
    new QuantileSummaries(ct, re, st, count, true)
  }
}

abstract class GkAggBase extends TypedImperativeAggregate[QuantileSummaries]
  with UnaryLike[Expression] {

  final override def merge(buffer: QuantileSummaries,
                           input: QuantileSummaries): QuantileSummaries = {
    val r = Gk.compressed(input)
    if (r.count == 0) Gk.compressed(buffer)
    else {
      val l = Gk.compressed(buffer)
      if (l.count == 0) r
      else {
        // the eps·n rank guarantee only survives a merge tree whose
        // sketches share a geometry; QuantileSummaries.merge never
        // checks, so unioning mixed-eps sketches would SILENTLY yield
        // mixed-accuracy answers. Fail like CmsUnionAgg does on
        // mismatched width/depth
        if (l.relativeError != r.relativeError)
          throw new IllegalArgumentException(
            s"$prettyName: cannot merge GK sketches with different " +
              s"relative errors (${l.relativeError} vs ${r.relativeError}); " +
              "rebuild with a shared eps")
        l.merge(r)
      }
    }
  }

  final override def eval(buffer: QuantileSummaries): Any =
    Gk.serialize(buffer)

  final override def serialize(buffer: QuantileSummaries): Array[Byte] =
    Gk.serialize(buffer)

  final override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    Gk.deserialize(bytes)

  final override def dataType: DataType = BinaryType
  final override def nullable: Boolean = false
}

case class GkAgg(child: Expression, eps: Double,
                 mutableAggBufferOffset: Int = 0,
                 inputAggBufferOffset: Int = 0) extends GkAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType if eps > 0 && eps < 1 => TypeCheckResult.TypeCheckSuccess
    case _: NumericType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs 0 < eps < 1, got $eps")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  override def update(buffer: QuantileSummaries,
                      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val d = v match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: Long => x.toDouble
        case x: Int => x.toDouble
        case x: Short => x.toDouble
        case x: Byte => x.toDouble
        case x: org.apache.spark.sql.types.Decimal => x.toDouble
        case other => throw new IllegalArgumentException(
          s"$prettyName: unsupported value $other")
      }
      buffer.insert(d)
    }
  }

  override def prettyName: String = "graft_gk_sketch"
  override def withNewMutableAggBufferOffset(o: Int): GkAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GkAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): GkAgg =
    copy(child = c)
}

case class GkUnionAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0) extends GkAggBase {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch input, got ${other.simpleString}")
  }

  // geometry (eps, threshold) is taken from the first merged sketch
  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      QuantileSummaries.defaultRelativeError)

  override def update(buffer: QuantileSummaries,
                      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else merge(buffer, Gk.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def prettyName: String = "graft_gk_union"
  override def withNewMutableAggBufferOffset(o: Int): GkUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GkUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): GkUnionAgg =
    copy(child = c)
}

/** φ-quantile point query over a serialized GK sketch. Null for an
  * empty sketch. Deserializes per row — rollup-level use only, like
  * [[CmsEstimate]]; the CodegenFallback is deliberate.
  */
case class GkQuantileOf(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary sketch, double phi), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gk_quantile"

  override def nullSafeEval(sk: Any, phi: Any): Any = {
    val p = phi.asInstanceOf[Double]
    require(p >= 0 && p <= 1, s"$prettyName: phi must be in [0,1], got $p")
    Gk.deserialize(sk.asInstanceOf[Array[Byte]]).query(p).getOrElse(null)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

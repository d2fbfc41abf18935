package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Z-order (Morton) curve value for multi-dimensional data layout.
  *
  * Input: an `array<double>` of the row's dimension values (one per
  * clustering dimension). Each value is mapped to a rank bucket by
  * binary search over that dimension's quantile cutpoints (computed
  * once, driver-side, model-sized — they ride into the generated
  * code as a reference object), and the bucket bits of all
  * dimensions are interleaved into one long. Sorting by that long
  * places rows that are close in EVERY dimension into the same file,
  * so parquet min/max footer stats prune scans filtered on ANY
  * subset of the dimensions — the multi-dimensional generalization
  * of sort-by-one-column layout, and the standard lakehouse answer
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`) to "which files can this
  * 100 TB scan skip?".
  *
  * Bucketing is rank-based, not value-based: quantile cutpoints give
  * equal-population buckets, so skewed dimensions still spread over
  * the full bit range (a value-linear mapping would collapse a
  * heavy-tailed dimension into a handful of buckets and lose its
  * pruning power).
  *
  * Null handling: a null dimension value lands in bucket 0 — layout
  * is a physical property, every row must land somewhere; a null
  * z-value would exclude the row from range partitioning. A null
  * ARRAY yields null (nothing to place).
  *
  * All dimensions use the same bit width `bits`;
  * `ndims * bits <= 63` keeps the curve value in a signed long.
  */
case class ZValue(child: Expression, cuts: Seq[Array[Double]], bits: Int)
  extends UnaryExpression {

  private val ndims = cuts.size
  private val maxBucket = (1 << bits) - 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if ndims > 0 && bits > 0 && ndims * bits <= 63 =>
      if (cuts.forall(_.length <= maxBucket)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName: a dimension has more than ${maxBucket} cutpoints " +
          s"for bits=$bits")
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 0 < ndims*bits <= 63, got ndims=$ndims bits=$bits")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  /** Bucket = #cutpoints <= v (binary upper bound), clamped. */
  private def bucketOf(d: Int, v: Double): Int = {
    val c = cuts(d)
    var lo = 0; var hi = c.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (c(mid) <= v) lo = mid + 1 else hi = mid
    }
    if (lo > maxBucket) maxBucket else lo
  }

  /** Called from both interpreted eval and the generated code. */
  def compute(arr: ArrayData): Long = {
    require(arr.numElements() == ndims,
      s"$prettyName: row has ${arr.numElements()} dimensions, expected $ndims")
    var z = 0L
    var d = 0
    while (d < ndims) {
      val b = if (arr.isNullAt(d)) 0 else bucketOf(d, arr.getDouble(d))
      var i = 0
      while (i < bits) {
        z |= ((b >> i) & 1).toLong << (i * ndims + d)
        i += 1
      }
      d += 1
    }
    z
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zvalue", this, classOf[ZValue].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

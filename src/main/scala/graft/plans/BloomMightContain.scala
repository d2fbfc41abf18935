package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a BROADCAST Bloom filter.
  *
  * The scale problem this solves: an exact probe set small enough to
  * `broadcast()` caps out around the driver/executor memory budget; a
  * benchmark shingle set in the billions does not fit. A Bloom filter
  * at 1% false positives costs ~1.2 bytes/item, and false positives
  * are harmless here because callers re-verify candidates with an
  * exact join — the filter only has to be sound (never a false
  * negative, which Bloom guarantees).
  *
  * The filter rides a Spark broadcast variable, NOT an expression
  * literal: the expression serializes per task, so embedding a
  * multi-hundred-MB byte array in it would ship the filter with every
  * task and bloat every plan string; the broadcast handle is a few
  * bytes and executors fetch the filter once. Generated code probes
  * `mightContainLong` directly inside whole-stage codegen — no UDF,
  * no boxing.
  */
case class BloomMightContainLong(child: Expression,
                                 bloom: Broadcast[BloomFilter])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((${classOf[BloomFilter].getName}) $ref.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

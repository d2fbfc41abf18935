package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd 64-bit SimHash over an array<string> of tokens.
  *
  * Same semantics as graft.functions.simhash64 (spec-verified): token
  * hash = xxhash64(token) (seed 42); bit j of the sketch is set when
  * the majority of tokens have bit j set. One fused loop with a
  * 64-slot vote array — the HOF form allocates a fresh vote array per
  * token step and runs interpreted.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    var n = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          votes(j) += (h >>> j) & 1L
          j += 1
        }
        n += 1L
      }
      i += 1
    }
    var sketch = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) * 2 > n) sketch |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sketch)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val len = ctx.freshName("len")
      val h = ctx.freshName("h"); val j = ctx.freshName("j")
      val sketch = ctx.freshName("sketch")
      s"""
         |long[] $votes = new long[64];
         |long $n = 0L;
         |int $len = $arr.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $h = $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < 64; $j++) { $votes[$j] += ($h >>> $j) & 1L; }
         |    $n++;
         |  }
         |}
         |long $sketch = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] * 2 > $n) $sketch |= 1L << $j;
         |}
         |${ev.value} = $sketch;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd MinHash signature over shingles — array<string> (hash
  * the string) or array<long> (pre-hashed shingle identities from
  * [[ShingleHash64]], skipping the string hash entirely).
  *
  * Same hash family as graft.functions.minhashSignature (verified by
  * spec): per element, h1 = floorMod(a, 2^31-1) and
  * h2 = floorMod(xxhash64(a, 7), 2^31-1) — where for strings
  * a = XXH64.hashUTF8String(s, 42) and xxhash64(a, 7) chains
  * XXH64.hashInt(7, a) exactly like Spark's XxHash64 expression
  * folds its children — and sig_i = min over elements of h1+(i+1)*h2.
  *
  * The HOF formulation runs interpreted with a fresh signature-array
  * allocation per element; this expression is one fused primitive
  * loop per row. Null elements are skipped (matching `least`'s
  * null handling in the HOF form).
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  private val M31 = 2147483647L

  private def fromHashes: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckFailure(s"numHashes must be positive, got $numHashes")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> or array<long>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val hashed = fromHashes
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = if (hashed) arr.getLong(i)
          else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        val h1 = java.lang.Math.floorMod(a, M31)
        val h2 = java.lang.Math.floorMod(XXH64.hashInt(7, a), M31)
        var v = h1
        var k = 0
        while (k < numHashes) {
          v += h2
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val getElem = if (fromHashes) (a: String, i: String) => s"$a.getLong($i)"
      else (a: String, i: String) => s"$xxh.hashUTF8String($a.getUTF8String($i), 42L)"
    nullSafeCodeGen(ctx, ev, arr => {
      val sig = ctx.freshName("sig"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val a = ctx.freshName("a")
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
      val v = ctx.freshName("v"); val k = ctx.freshName("k")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    long $a = ${getElem(arr, i)};
         |    long $h1 = java.lang.Math.floorMod($a, ${M31}L);
         |    long $h2 = java.lang.Math.floorMod($xxh.hashInt(7, $a), ${M31}L);
         |    long $v = $h1;
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      $v += $h2;
         |      if ($v < $sig[$k]) $sig[$k] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd distinct word-n-gram shingle hashes over an
  * array<string> of tokens: one fused loop hashing each token once,
  * chaining XXH64 over each n-token window, then sort+unique — the
  * 8-byte shingle identities the dedup inverted index shuffles.
  *
  * Replaces the interpreted HOF pipeline
  * `array_distinct(transform(sequence…, concat_ws))` →
  * `transform(…, xxhash64)` (graft.functions.wordShingles +
  * tokenHashes), which allocates an n-gram STRING per window before
  * hashing it. Tokens carry no whitespace (they come from a
  * whitespace split), so the token-sequence → joined-string map is
  * injective and distinct window hashes equal distinct shingle
  * strings up to 64-bit collisions.
  *
  * Output: sorted ascending, no nulls; empty array when fewer than n
  * tokens. Null tokens hash as an empty string.
  */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"n must be positive, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val m = nTok - (n - 1)
    if (m <= 0) new GenericArrayData(Array.empty[Long])
    else {
      val th = new Array[Long](nTok)
      var i = 0
      while (i < nTok) {
        th(i) = if (arr.isNullAt(i)) XXH64.hashInt(0, 42L)
          else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        i += 1
      }
      val ws = new Array[Long](m)
      i = 0
      while (i < m) {
        var h = 42L
        var j = i
        while (j < i + n) { h = XXH64.hashLong(th(j), h); j += 1 }
        ws(i) = h
        i += 1
      }
      java.util.Arrays.sort(ws)
      var u = 0
      i = 0
      while (i < m) {
        if (i == 0 || ws(i) != ws(i - 1)) { ws(u) = ws(i); u += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(ws, u))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val nTok = ctx.freshName("nTok"); val m = ctx.freshName("m")
      val th = ctx.freshName("th"); val ws = ctx.freshName("ws")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val u = ctx.freshName("u")
      s"""
         |int $nTok = $arr.numElements();
         |int $m = $nTok - ${n - 1};
         |if ($m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $th = new long[$nTok];
         |  for (int $i = 0; $i < $nTok; $i++) {
         |    $th[$i] = $arr.isNullAt($i) ? $xxh.hashInt(0, 42L)
         |      : $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |  }
         |  long[] $ws = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $h = 42L;
         |    for (int $j = $i; $j < $i + $n; $j++) { $h = $xxh.hashLong($th[$j], $h); }
         |    $ws[$i] = $h;
         |  }
         |  java.util.Arrays.sort($ws);
         |  int $u = 0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($i == 0 || $ws[$i] != $ws[$i - 1]) { $ws[$u++] = $ws[$i]; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($ws, $u));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** POSITIONAL variant of [[ShingleHash64]]: element i is the hash of
  * the n-token window STARTING AT token i — no sort, no dedup, so
  * window hits map back to token offsets. This is what span-level
  * surgery needs (remove the tokens under a matched window), where
  * the dedup'd form only answers set questions.
  *
  * Output length: max(0, numTokens - n + 1).
  */
case class ShingleHashPos64(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"n must be positive, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles_pos"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val m = nTok - (n - 1)
    if (m <= 0) new GenericArrayData(Array.empty[Long])
    else {
      val th = new Array[Long](nTok)
      var i = 0
      while (i < nTok) {
        th(i) = if (arr.isNullAt(i)) XXH64.hashInt(0, 42L)
          else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        i += 1
      }
      val ws = new Array[Long](m)
      i = 0
      while (i < m) {
        var h = 42L
        var j = i
        while (j < i + n) { h = XXH64.hashLong(th(j), h); j += 1 }
        ws(i) = h
        i += 1
      }
      new GenericArrayData(ws)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val nTok = ctx.freshName("nTok"); val m = ctx.freshName("m")
      val th = ctx.freshName("th"); val ws = ctx.freshName("ws")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |int $nTok = $arr.numElements();
         |int $m = $nTok - ${n - 1};
         |if ($m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $th = new long[$nTok];
         |  for (int $i = 0; $i < $nTok; $i++) {
         |    $th[$i] = $arr.isNullAt($i) ? $xxh.hashInt(0, 42L)
         |      : $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |  }
         |  long[] $ws = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $h = 42L;
         |    for (int $j = $i; $j < $i + $n; $j++) { $h = $xxh.hashLong($th[$j], $h); }
         |    $ws[$i] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($ws);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

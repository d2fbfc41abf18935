package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reverse lookup for [[ShingleHash64]] identities: emit the n-gram
  * STRINGS of exactly those token windows whose shingle hash is in
  * `wanted` (distinct within the row, first occurrence order).
  *
  * This is the candidate-recovery half of hash-first top-k n-gram
  * counting: phase 1 counts 8-byte hashes corpus-wide (no string is
  * ever built or shuffled), phase 2 re-scans building strings ONLY
  * for the model-sized candidate set — at 100 TB the difference is
  * shuffling longs vs shuffling every n-gram string in the corpus.
  * Same hashing as ShingleHash64 (token XXH64 chained per window), so
  * identities line up by construction.
  */
case class ShingleLookup(child: Expression, n: Int, wanted: Seq[Long])
  extends UnaryExpression {

  private lazy val sortedWanted: Array[Long] = {
    val a = wanted.toArray
    java.util.Arrays.sort(a)
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"n must be positive, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_lookup"

  private def tokenHash(arr: ArrayData, i: Int): Long =
    if (arr.isNullAt(i)) XXH64.hashInt(0, 42L)
    else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val m = nTok - (n - 1)
    if (m <= 0 || sortedWanted.isEmpty) new GenericArrayData(Array.empty[Any])
    else {
      val th = Array.tabulate(nTok)(tokenHash(arr, _))
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
      val space = UTF8String.fromString(" ")
      var i = 0
      while (i < m) {
        var h = 42L
        var j = i
        while (j < i + n) { h = XXH64.hashLong(th(j), h); j += 1 }
        if (java.util.Arrays.binarySearch(sortedWanted, h) >= 0 && seen.add(h)) {
          val toks = Array.tabulate(n)(k =>
            if (arr.isNullAt(i + k)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i + k))
          out += UTF8String.concatWs(space, toks: _*)
        }
        i += 1
      }
      new GenericArrayData(out.toArray[Any])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val utf8 = classOf[UTF8String].getName
    val wantedRef = ctx.addReferenceObj("wanted", sortedWanted, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val nTok = ctx.freshName("nTok"); val m = ctx.freshName("m")
      val th = ctx.freshName("th"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val seen = ctx.freshName("seen"); val out = ctx.freshName("out")
      val toks = ctx.freshName("toks"); val k = ctx.freshName("k")
      s"""
         |int $nTok = $arr.numElements();
         |int $m = $nTok - ${n - 1};
         |java.util.ArrayList<$utf8> $out = new java.util.ArrayList<$utf8>();
         |if ($m > 0 && $wantedRef.length > 0) {
         |  long[] $th = new long[$nTok];
         |  for (int $i = 0; $i < $nTok; $i++) {
         |    $th[$i] = $arr.isNullAt($i) ? $xxh.hashInt(0, 42L)
         |      : $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |  }
         |  java.util.HashSet<Long> $seen = new java.util.HashSet<Long>();
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $h = 42L;
         |    for (int $j = $i; $j < $i + $n; $j++) { $h = $xxh.hashLong($th[$j], $h); }
         |    if (java.util.Arrays.binarySearch($wantedRef, $h) >= 0 && $seen.add($h)) {
         |      $utf8[] $toks = new $utf8[$n];
         |      for (int $k = 0; $k < $n; $k++) {
         |        $toks[$k] = $arr.isNullAt($i + $k)
         |          ? $utf8.EMPTY_UTF8 : $arr.getUTF8String($i + $k);
         |      }
         |      $out.add($utf8.concatWs($utf8.fromString(" "), $toks));
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

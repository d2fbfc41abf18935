package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd TRUE Damerau-Levenshtein edit distance — insertions,
  * deletions, substitutions, and transpositions of adjacent
  * characters, where a transposed pair may be edited further (the
  * Lowrance–Wagner 1975 formulation with the last-occurrence table —
  * NOT the weaker "optimal string alignment" variant: DL("CA","ABC")
  * = 2, OSA gives 3). Complements `levenshtein` (no transpositions)
  * and [[JaroWinkler]] (similarity, not distance) in the
  * record-linkage toolbox: typo-tolerant matching where a swap
  * ("hte" → "the") should cost one edit, not two.
  *
  * Exact integer output — bit-deterministic everywhere. Operates on
  * UTF-16 code units (DuckDB's `damerau_levenshtein` walks UTF-8
  * BYTES, so the oracle parity contract holds on ASCII data, where
  * byte == code unit — the `q104_damerau_dedup` oracle uses ASCII
  * part names).
  *
  * A plain `BinaryExpression` calling the static helper from
  * generated code — fuses into the surrounding codegen span like
  * Spark's own `levenshtein`. The DP needs a full (|a|+2)×(|b|+2)
  * matrix (the transposition recurrence reaches arbitrarily far back,
  * so the two-row trick does not apply); inputs are capped at 16M
  * cells (64 MB) with a clear refusal — this is a short-string
  * (name/title) metric, and an accidental document-pair comparison
  * should fail loudly, not OOM an executor.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DamerauLevenshtein.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$helper.distance($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  private final val MaxCells = 16 * 1024 * 1024

  /** Called from generated code — must stay public and static-shaped. */
  def distance(a: UTF8String, b: UTF8String): Int =
    distance(a.toString, b.toString)

  def distance(s1: String, s2: String): Int = {
    if (s1 == s2) return 0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    require((l1 + 2).toLong * (l2 + 2) <= MaxCells,
      s"graft_damerau_levenshtein: ${l1}x$l2 chars exceeds the 16M-cell " +
        "DP budget — this is a short-string (name/title) metric; " +
        "for long-text similarity use the shingle/minhash operators")
    val inf = l1 + l2
    val w = l2 + 2
    // d(i)(j) flattened; indexes shifted by 1 (row/col 0 = the inf fence)
    val d = new Array[Int]((l1 + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= l1) {
      d((i + 1) * w) = inf
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= l2) {
      d(j + 1) = inf
      d(w + j + 1) = j
      j += 1
    }
    // last row where each char of the (combined) alphabet occurred in s1
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k: Int = { val v = da.get(s2.charAt(j - 1)); if (v == null) 0 else v }
        val l = db
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da.put(s1.charAt(i - 1), i)
      i += 1
    }
    d((l1 + 1) * w + l2 + 1)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler similarity — the record-linkage edit metric
  * Spark lacks (it ships only `levenshtein`). Fuzzy matching of names
  * and titles ranks candidates by JW because it rewards shared
  * prefixes and tolerates transpositions, which plain edit distance
  * punishes equally.
  *
  * Implements the classic algorithm exactly (Winkler 1990): Jaro
  * similarity `(m/|a| + m/|b| + (m-t)/m) / 3` with the standard
  * matching window `max(|a|,|b|)/2 - 1`, then the Winkler prefix
  * boost `jaro + l·0.1·(1-jaro)` for a common prefix of up to 4
  * chars, applied only when `jaro > 0.7`. Every floating-point step
  * keeps this exact operation order, which makes results reproducible
  * bit-for-bit across engines that implement the same classic
  * definition (the contract the `q78_jaro_dedup` oracle leans on).
  *
  * A plain `BinaryExpression` whose generated code calls the static
  * helper below — it fuses into the surrounding codegen span the way
  * Spark's own `levenshtein` does, rather than forcing the whole
  * projection into interpreted mode as a Scala UDF would. The scan
  * operates on UTF-16 char arrays from `UTF8String.toString`; the
  * O(|a|·|b|) window walk allocates only two boolean arrays.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = JaroWinkler.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$helper.similarity($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  private final val BoostThreshold = 0.7
  private final val PrefixScale = 0.1
  private final val MaxPrefix = 4

  /** Called from generated code — must stay public and static-shaped. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)

  def similarity(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk matched chars of both strings in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val halfT = t / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - halfT) / m) / 3
    if (jaro <= BoostThreshold) return jaro
    var prefix = 0
    val maxP = math.min(MaxPrefix, math.min(l1, l2))
    while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * PrefixScale * (1 - jaro)
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd cosine similarity between two numeric arrays.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(...))`, graft.functions.cosineSim) runs
  * interpreted and allocates an intermediate array per row; this
  * expression emits a single fused loop over the unsafe array data —
  * no allocation, no boxing — and participates in whole-stage
  * codegen. This is the hot inner loop of ANN search
  * (SURVEY.md §2c rows 38-40).
  *
  * Semantics: computed in double over the common prefix of the two
  * arrays; 0.0 when either norm is zero; null if either side or any
  * touched element is null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isSupported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isSupported(left.dataType) && isSupported(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>/array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val leftIsFloat = elemType(left) == FloatType
    val rightIsFloat = elemType(right) == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rightGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xv = (double) $a.$leftGet($i);
         |  double $yv = (double) $b.$rightGet($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if (!${ev.isNull}) {
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

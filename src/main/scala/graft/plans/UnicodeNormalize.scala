package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization (NFC/NFD/NFKC/NFKD) — the
  * canonicalization front end of text dedup and tokenization: "é" as
  * one codepoint and "e"+combining-acute must hash, shingle and
  * tokenize identically, or every downstream equality (exact dedup,
  * line dedup, decontamination probes) silently misses visually
  * identical text.
  *
  * Spark ships no normalizer function; the alternative — a Scala UDF —
  * would break whole-stage codegen for the entire scan projection it
  * sits in. This is a plain `UnaryExpression` whose generated code
  * calls the JDK's `java.text.Normalizer` directly (stateless, thread
  * safe), so it fuses into the same codegen span as the split/hash
  * expressions around it. The ASCII-only fast path skips the JDK call
  * entirely: `Normalizer.isNormalized` is O(length) over chars and
  * ASCII is always normalized in all four forms — on mostly-ASCII web
  * corpora the expensive decompose/recompose never runs.
  */
case class UnicodeNormalize(child: Expression, formName: String)
  extends UnaryExpression {

  UnicodeNormalize.formOf(formName) // validate eagerly

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(v: Any): Any =
    UnicodeNormalize.normalize(v.asInstanceOf[UTF8String], formName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = UnicodeNormalize.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c =>
      s"""$helper.normalize($c, "$formName")""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {

  private[plans] def formOf(name: String): Normalizer.Form = name match {
    case "NFC"  => Normalizer.Form.NFC
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"graft_normalize: form must be NFC/NFD/NFKC/NFKD, got '$other'")
  }

  /** Called from generated code — must stay public and static-shaped. */
  def normalize(s: UTF8String, formName: String): UTF8String = {
    val str = s.toString
    val form = formOf(formName)
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

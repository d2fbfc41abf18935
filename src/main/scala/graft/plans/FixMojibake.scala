package graft.plans

import java.nio.charset.{CharacterCodingException, StandardCharsets}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MOJIBAKE repair — undo the single most common encoding
  * accident in web corpora: UTF-8 bytes mistakenly decoded as
  * Latin-1/cp1252 ("café" shipped as "cafÃ©"). Dedup and shingling
  * treat the corrupted and clean spellings as unrelated text, so the
  * same document escapes near-dup detection and the corrupted copy
  * poisons token statistics.
  *
  * The repair is conservative and deterministic:
  *  - only strings whose every char is < U+0100 are candidates (a
  *    char ≥ U+0100 cannot have come from a byte-per-char misdecode);
  *  - the chars are reinterpreted as their byte values and STRICTLY
  *    decoded as UTF-8 — any malformed sequence aborts the repair and
  *    returns the input unchanged (real Latin-1 text like "café" has
  *    0xE9 as a lone continuation byte: invalid, untouched);
  *  - pure ASCII round-trips to itself (no allocation, fast path);
  *  - one pass only: double-mojibake is left for a second call, by
  *    choice — each pass is individually auditable.
  *
  * A plain `UnaryExpression` whose generated code calls the static
  * helper — fuses into the scan's codegen span like its sibling
  * [[UnicodeNormalize]].
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"

  override protected def nullSafeEval(v: Any): Any =
    FixMojibake.repair(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = FixMojibake.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.repair($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixMojibake {

  /** Called from generated code — must stay public and static-shaped. */
  def repair(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    var i = 0
    var allLow = true
    var anyHigh = false
    while (i < n && allLow) {
      val c = str.charAt(i)
      if (c >= 0x100) allLow = false
      else if (c >= 0x80) anyHigh = true
      i += 1
    }
    if (!allLow || !anyHigh) return s // not byte-shaped, or pure ASCII
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) { bytes(i) = str.charAt(i).toByte; i += 1 }
    try {
      val decoder = StandardCharsets.UTF_8.newDecoder() // strict by default
      val decoded = decoder.decode(ByteBuffer.wrap(bytes)).toString
      if (decoded == str) s else UTF8String.fromString(decoded)
    } catch {
      case _: CharacterCodingException => s // genuine Latin-1: untouched
    }
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd PORTER STEMMER — the classic suffix-stripping stemmer
  * (M.F. Porter, "An algorithm for suffix stripping", Program 14(3)
  * 1980), implemented from the paper's rule tables (the ORIGINAL
  * rules, e.g. ABLI→ABLE — not the later revised variants). Stemming
  * conflates inflected surface forms (connect/connected/connecting/
  * connection → connect), which tightens token statistics, TF-IDF
  * vocabularies, and n-gram dedup signatures at corpus scale.
  *
  * Deterministic and conservative: the stemmer is defined on
  * lowercase ASCII words, so anything else — mixed case, digits,
  * punctuation, non-ASCII — passes through UNCHANGED (a stemmer runs
  * after tokenization + lowercasing; guessing on other content would
  * be silently lossy), as do words of length ≤ 2 (per the paper).
  *
  * A plain `UnaryExpression` whose generated code calls the static
  * helper — fuses into the scan's codegen span like its siblings
  * [[UnicodeNormalize]] and [[FixMojibake]].
  */
case class PorterStem(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_porter_stem"

  override protected def nullSafeEval(v: Any): Any =
    PorterStem.stem(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = PorterStem.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$helper.stem($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PorterStem {

  /** Called from generated code — must stay public and static-shaped. */
  def stem(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    if (n <= 2) return u
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c < 'a' || c > 'z') return u
      i += 1
    }
    val out = new Stemmer(s).run()
    if (out == s) u else UTF8String.fromString(out)
  }

  /** One word's pass through steps 1–5. Working buffer `b(0..k)`;
    * `j` marks the stem end set by the last successful suffix match.
    */
  private final class Stemmer(w: String) {
    private var b: Array[Char] = w.toCharArray
    private var k: Int = b.length - 1
    private var j: Int = 0

    // y is a consonant at position 0 or after a vowel
    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => i == 0 || !cons(i - 1)
      case _ => true
    }

    /** The measure m of b(0..j): the number of VC sequences in the
      * canonical form [C](VC)^m[V].
      */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1 // initial consonant run
      if (i > j) return 0
      while (true) {
        while (i <= j && !cons(i)) i += 1 // vowel run
        if (i > j) return n
        n += 1
        while (i <= j && cons(i)) i += 1 // consonant run
        if (i > j) return n
      }
      n
    }

    private def vowelInStem: Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** consonant-vowel-consonant ending at i, final consonant not
      * w/x/y — the *o condition (so "-e" restores e.g. hop-ing → hope
      * shapes like fil-ing → file).
      */
    private def cvc(i: Int): Boolean =
      i >= 2 && cons(i) && !cons(i - 1) && cons(i - 2) && {
        val c = b(i); c != 'w' && c != 'x' && c != 'y'
      }

    /** True iff b(0..k) ends with s; sets j to the stem end ONLY on
      * match.
      */
    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) {
        if (b(o + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    /** Replace the matched suffix b(j+1..k) with s. */
    private def setTo(s: String): Unit = {
      val l = s.length
      val nb = new Array[Char](j + 1 + l)
      System.arraycopy(b, 0, nb, 0, j + 1)
      var i = 0
      while (i < l) { nb(j + 1 + i) = s.charAt(i); i += 1 }
      b = nb
      k = j + l
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    // Step 1a: plurals. SSES→SS, IES→I, SS→SS, S→()
    private def step1a(): Unit =
      if (ends("sses")) setTo("ss")
      else if (ends("ies")) setTo("i")
      else if (ends("ss")) ()
      else if (ends("s")) setTo("")

    // Step 1b: past tense / gerunds, with the cleanup rules
    private def step1b(): Unit = {
      if (ends("eed")) { if (m() > 0) setTo("ee") }
      else if ((ends("ed") || ends("ing")) && vowelInStem) {
        k = j // drop the suffix
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          val c = b(k)
          if (c != 'l' && c != 's' && c != 'z') k -= 1
        } else if (m() == 1 && cvc(k)) { j = k; setTo("e") }
      }
    }

    // Step 1c: (*v*) Y → I
    private def step1c(): Unit =
      if (ends("y") && vowelInStem) setTo("i")

    // Step 2: double-suffix reductions (m>0), keyed by the
    // penultimate letter; ORIGINAL paper table (ABLI→ABLE)
    private def step2(): Unit = {
      if (k < 1) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("abli")) r("able")
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case _ => ()
      }
    }

    // Step 3: -ic-, -full, -ness etc. (m>0)
    private def step3(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ => ()
    }

    // Step 4: strip residual suffixes when the stem is long (m>1)
    private def step4(): Unit = {
      if (k < 1) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) ||
          ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    // Step 5a: drop a final e when the stem is long enough
    private def step5a(): Unit = {
      j = k
      if (ends("e")) {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
    }

    // Step 5b: -LL → -L for long stems
    private def step5b(): Unit = {
      j = k
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }

    def run(): String = {
      step1a(); step1b(); step1c()
      step2(); step3(); step4()
      step5a(); step5b()
      new String(b, 0, k + 1)
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GraftFunctions, PorterStem}

/** Porter stemmer: the paper's own example table (Porter 1980, §the
  * rule walkthrough), the famous multi-step chain, pass-through
  * rules, and the SQL/codegen surface.
  */
class PorterStemSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def st(w: String): String =
    PorterStem.stem(UTF8String.fromString(w)).toString

  // NOTE: the paper's tables illustrate SINGLE rules; expectations
  // here are the full pipeline's outputs (later steps strip further:
  // agreed →1b agree →5a agre).
  test("step-1-family words, full-pipeline outputs") {
    val cases = Map(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file", "happy" -> "happi", "sky" -> "sky")
    cases.foreach { case (in, want) => assert(st(in) === want, s"stem($in)") }
  }

  test("step-2-4-family words, full-pipeline outputs") {
    val cases = Map(
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "hesitanci" -> "hesit", "digitizer" -> "digit",
      "conformabli" -> "conform", "radicalli" -> "radic",
      "differentli" -> "differ", "vileli" -> "vile",
      "analogousli" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "callousness" -> "callous",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "sensibiliti" -> "sensibl",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "commun",
      "activate" -> "activ", "angulariti" -> "angular",
      "homologous" -> "homolog", "effective" -> "effect",
      "bowdlerize" -> "bowdler")
    cases.foreach { case (in, want) => assert(st(in) === want, s"stem($in)") }
  }

  test("step 5 examples and the multi-step chain") {
    assert(st("probate") === "probat")
    assert(st("rate") === "rate")
    assert(st("cease") === "ceas")
    assert(st("controll") === "control")
    assert(st("roll") === "roll")
    // the paper's flagship derivation chain
    assert(st("generalizations") === "gener")
    assert(st("oscillators") === "oscil")
  }

  test("pass-through: short words, non-lowercase, non-alpha, unicode") {
    for (w <- Seq("a", "is", "Running", "can't", "run42", "café", ""))
      assert(st(w) === w, s"pass-through($w)")
  }

  test("SQL and Column surfaces agree with the direct helper") {
    GraftFunctions.register(spark)
    val words = Seq("generalizations", "hopping", "sky", "Running")
    val viaSql = spark.sql(
      "SELECT graft_porter_stem(w) FROM VALUES " +
        words.map(w => s"('$w')").mkString(",") + " AS t(w)")
      .as[String].collect().toSeq
    assert(viaSql === words.map(st))
    val viaCol = words.toDF("w")
      .select(GraftFunctions.porterStemFast($"w")).as[String].collect().toSeq
    assert(viaCol === words.map(st))
    // null-safe
    assert(Seq[Option[String]](None).toDF("w")
      .select(GraftFunctions.porterStemFast($"w"))
      .collect()(0).isNullAt(0))
  }
}

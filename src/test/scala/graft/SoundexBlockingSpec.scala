package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityResolution

/** Phonetic (Soundex) blocking for entity resolution: sound-alike
  * spellings pair where the exact-token block never would; verifier
  * and caps unchanged.
  */
class SoundexBlockingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val phonetic: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => soundex(element_at(split(c, " "), -1))

  test("sound-alike surnames cluster under soundex blocking, not under exact-token") {
    // Smyth/Smith: soundex S530 == S530 but the exact last-token
    // block keys differ, so only the phonetic key pairs them
    val names = Seq("ann smith", "ann smyth", "bob jonsen", "bob johnsen",
      "carl quartz").toDF("name")
    def clusters(blk: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      EntityResolution.cluster(names, "name", maxEdit = 2, blockKey = blk)
        .as[(String, String)].collect().toMap
    val phon = clusters(phonetic)
    assert(phon("ann smith") == phon("ann smyth"))
    assert(phon("bob jonsen") == phon("bob johnsen"))
    assert(phon("carl quartz") != phon("ann smith"))
    val exact = clusters(EntityResolution.defaultBlockKey)
    assert(exact("ann smith") != exact("ann smyth"),
      "exact-token blocking should NOT pair smith/smyth")
  }

  test("the edit-distance verifier still rejects phonetic false candidates") {
    // robert/ruppert share soundex R163 but are edit distance 3
    // (o→u, b→p, +p) — blocked together, rejected by the verifier
    // at maxEdit 2
    val names = Seq("robert", "ruppert").toDF("name")
    val got = EntityResolution.cluster(names, "name", maxEdit = 2,
        blockKey = phonetic)
      .as[(String, String)].collect().toMap
    assert(got("robert") != got("ruppert"))
  }

  test("contract query q144_soundex_blocking: deterministic census") {
    val a = SparkEntry.queries("q144_soundex_blocking")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("q144_soundex_blocking")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}

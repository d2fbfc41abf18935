package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunking, RangeJoin}

/** Randomized properties: the bucketed range join equals the naive
  * range join for arbitrary probe/interval layouts and bucket widths,
  * and chunking reconstructs arbitrary token streams. Deterministic
  * seed via scalacheck's fixed initial-seed parameters — failures
  * replay.
  */
class RangeJoinPropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val base = Timestamp.valueOf("2024-06-01 00:00:00").getTime

  private def check(prop: Prop, tests: Int): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(tests)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: bucketed interval join == naive join (random layouts/widths)") {
    import spark.implicits._
    val genProbe = Gen.listOfN(40, Gen.choose(0L, 4L * 86400)) // 4 days of offsets
    val genIv = Gen.listOfN(12, for {
      s <- Gen.choose(0L, 4L * 86400)
      len <- Gen.choose(0L, 86400L) // up to a day, zero-length included
    } yield (s, s + len))
    val genWidth = Gen.oneOf(1800L, 3600L, 6 * 3600L, 86400L)

    val prop = Prop.forAll(genProbe, genIv, genWidth) { (ps, ivs, w) =>
      val probe = ps.zipWithIndex
        .map { case (off, i) => (i.toLong, new Timestamp(base + off * 1000)) }
        .toDF("p_id", "t")
      val iv = ivs.zipWithIndex
        .map { case ((s, e), i) =>
          (i.toLong, new Timestamp(base + s * 1000), new Timestamp(base + e * 1000)) }
        .toDF("iv_id", "w_start", "w_end")
      val got = RangeJoin.intervalJoin(probe, "t", iv, "w_start", "w_end", w)
        .select("p_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
      val want = probe.join(iv,
          col("t") >= col("w_start") && col("t") < col("w_end"))
        .select("p_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
      got == want && got.size == got.distinct.size
    }
    check(prop, 12) // each case runs 2 Spark jobs; 12 layouts × 4 widths rotate
  }

  test("property: chunking reconstructs arbitrary token streams") {
    import spark.implicits._
    val genDoc = for {
      n <- Gen.choose(1, 120)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "b", "cde", "f0", "g"))
    } yield toks
    val genShape = for {
      size <- Gen.choose(1, 16)
      stride <- Gen.choose(1, size)
    } yield (size, stride)

    val prop = Prop.forAll(genDoc, genShape) { case (toks, (size, stride)) =>
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = Chunking.chunk(df, "doc_id", "text", size, stride)
        .as[(Long, Long, Long, String)].collect().sortBy(_._2)
      // stride-aligned reconstruction covers the whole stream
      val rebuilt = chunks.init.flatMap(_._4.split(" ").take(stride)) ++
        chunks.last._4.split(" ")
      val lengthsOk = chunks.forall(c => c._3 <= size && c._3 >= 1)
      val idxOk = chunks.map(_._2).toSeq == chunks.indices.map(_.toLong)
      rebuilt.toSeq == toks && lengthsOk && idxOk
    }
    check(prop, 25)
  }
}

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

  test("NTZ columns: bucketed == naive under a DST session TZ, boundary probe in the spring-forward gap") {
    import java.time.LocalDateTime
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      // 2024-03-10 02:00–03:00 wall clock does not exist in
      // America/New_York. NTZ values in the gap are still distinct
      // wall-clock values; a session-TZ epoch would collapse them and
      // a probe on an exact bucket boundary could land in the wrong
      // bucket. Pin parity with the naive join through the gap.
      val probe = Seq(
        (1L, LocalDateTime.parse("2024-03-10T02:30:00")), // 1800s-bucket boundary inside the gap
        (2L, LocalDateTime.parse("2024-03-10T01:59:59")),
        (3L, LocalDateTime.parse("2024-03-10T03:00:00")),
        (4L, LocalDateTime.parse("2024-03-10T02:00:00")),
        (5L, LocalDateTime.parse("2024-03-09T12:00:00"))
      ).toDF("p_id", "t")
      assert(probe.schema("t").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      val iv = Seq(
        (10L, LocalDateTime.parse("2024-03-10T02:30:00"),
          LocalDateTime.parse("2024-03-10T03:00:00")),
        (11L, LocalDateTime.parse("2024-03-10T01:00:00"),
          LocalDateTime.parse("2024-03-10T02:30:00")),
        (12L, LocalDateTime.parse("2024-03-09T00:00:00"),
          LocalDateTime.parse("2024-03-11T00:00:00"))
      ).toDF("iv_id", "w_start", "w_end")
      for (w <- Seq(1800L, 3600L, 86400L)) {
        val got = RangeJoin.intervalJoin(probe, "t", iv, "w_start", "w_end", w)
          .select("p_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
        val want = probe.join(iv,
            col("t") >= col("w_start") && col("t") < col("w_end"))
          .select("p_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
        assert(got == want, s"width=$w")
        // the load-bearing boundary: the gap probe belongs to the
        // half-open interval starting at it, not the one ending at it
        assert(want.contains((1L, 10L)) && !want.contains((1L, 11L)))
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("spreadProbe/spreadIntervals: identical results, one extra exchange per knob") {
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
    import spark.implicits._
    val probe = (0 until 200)
      .map(i => (i.toLong, new Timestamp(base + i * 977000L))).toDF("p_id", "t")
    val iv = (0 until 20)
      .map(i => (i.toLong, new Timestamp(base + i * 9000000L),
        new Timestamp(base + i * 9000000L + 7200000L)))
      .toDF("iv_id", "w_start", "w_end")
    def run(sp: Boolean, si: Boolean) = RangeJoin.intervalJoin(
      probe, "t", iv, "w_start", "w_end", 3600,
      spreadProbe = sp, spreadIntervals = si)
    val expect = run(sp = false, si = false)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
    assert(expect.nonEmpty)
    def repartitions(sp: Boolean, si: Boolean): Int =
      run(sp, si).queryExecution.optimizedPlan.collect {
        case r: RepartitionByExpression => r
      }.size
    for ((sp, si) <- Seq((true, false), (false, true), (true, true))) {
      val got = run(sp, si)
        .select("p_id", "iv_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got == expect, s"spreadProbe=$sp spreadIntervals=$si")
      assert(repartitions(sp, si) == (if (sp) 1 else 0) + (if (si) 1 else 0),
        s"spreadProbe=$sp spreadIntervals=$si")
    }
    assert(repartitions(sp = false, si = false) == 0)
  }

  test("mixed NTZ/LTZ time columns are rejected up front") {
    import java.time.LocalDateTime
    import spark.implicits._
    val probe = Seq((1L, new Timestamp(base))).toDF("p_id", "t")
    val iv = Seq((1L, LocalDateTime.parse("2024-06-01T00:00:00"),
      LocalDateTime.parse("2024-06-01T01:00:00"))).toDF("iv_id", "w_start", "w_end")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(probe, "t", iv, "w_start", "w_end", 3600)
    }
    assert(e.getMessage.contains("mix"))
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

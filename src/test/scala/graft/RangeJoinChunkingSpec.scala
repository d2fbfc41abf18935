package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunking, RangeJoin}

/** Property specs for the round-5 operators: bucketed interval join
  * (RangeJoin) and token-window chunking (Chunking).
  */
class RangeJoinChunkingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("RangeJoin matches the naive range join, each pair exactly once") {
    import spark.implicits._
    // events every 40 minutes over ~5 days; intervals of varying
    // length (zero-length, sub-bucket, multi-bucket) at varied offsets
    val probe = (0 until 180)
      .map(i => (i.toLong, ts(f"2024-03-0${1 + i / 36}%d ${(i % 36) * 40 / 60}%02d:${(i % 36) * 40 % 60}%02d:00")))
      .toDF("p_id", "t")
    val iv = Seq(
      (1L, ts("2024-03-01 00:00:00"), ts("2024-03-01 00:00:00")), // empty
      (2L, ts("2024-03-01 05:00:00"), ts("2024-03-01 07:30:00")), // sub-bucket
      (3L, ts("2024-03-01 23:00:00"), ts("2024-03-02 01:00:00")), // crosses midnight
      (4L, ts("2024-03-02 00:00:00"), ts("2024-03-05 00:00:00")), // multi-bucket
      (5L, ts("2024-03-04 12:00:00"), ts("2024-03-04 12:40:00")), // single hit, boundary start
      (6L, ts("2024-03-06 00:00:00"), ts("2024-03-07 00:00:00"))  // past the data
    ).toDF("iv_id", "w_start", "w_end")

    for (bucketSeconds <- Seq(3600L, 6 * 3600L, 86400L)) {
      val got = RangeJoin.intervalJoin(probe, "t", iv, "w_start", "w_end", bucketSeconds)
        .select("p_id", "iv_id").as[(Long, Long)].collect().toSeq
      val want = probe.as("p").join(iv.as("i"),
          col("t") >= col("w_start") && col("t") < col("w_end"))
        .select("p_id", "iv_id").as[(Long, Long)].collect().toSeq
      assert(got.sorted == want.sorted, s"bucketSeconds=$bucketSeconds")
      assert(got.size == got.distinct.size, s"duplicate pairs at bucketSeconds=$bucketSeconds")
    }
  }

  test("RangeJoin boundary semantics: start inclusive, end exclusive") {
    import spark.implicits._
    val probe = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")))
      .toDF("p_id", "t")
    val iv = Seq((7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iv_id", "w_start", "w_end")
    val got = RangeJoin.intervalJoin(probe, "t", iv, "w_start", "w_end", 3600L)
      .select("p_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("RangeJoin: oversized interval fails fast with the guard message") {
    import spark.implicits._
    val probe = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("p_id", "t")
    val iv = Seq((1L, ts("2020-01-01 00:00:00"), ts("2030-01-01 00:00:00")))
      .toDF("iv_id", "w_start", "w_end")
    val ex = intercept[Exception] {
      RangeJoin.intervalJoin(probe, "t", iv, "w_start", "w_end",
        bucketSeconds = 60L, maxBucketsPerInterval = 1000).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("RangeJoin: interval spans")), ex.getMessage)
  }

  test("q34 plan: no nested-loop or cartesian join anywhere") {
    val p = SparkEntry.queries("q34_range_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString()
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("Chunking: chunks reconstruct the token stream; tails emitted") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens
      (2L, "a b c"),                                   // shorter than one chunk
      (3L, "x")                                        // single token
    ).toDF("doc_id", "text")
    val out = Chunking.chunk(docs, "doc_id", "text", 32, 24)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    // doc 1: starts 0,24,48,72,96 → lengths 32,32,32,28,4
    assert(out(1L).map(_._3).toSeq == Seq(32L, 32L, 32L, 28L, 4L))
    // stride-aligned reconstruction: each chunk's first `stride`
    // tokens concatenated, plus the last chunk's remainder, equals
    // the original token stream
    val toks1 = (1 to 100).map(i => s"t$i")
    val rebuilt = out(1L).init.flatMap(_._4.split(" ").take(24)) ++
      out(1L).last._4.split(" ")
    assert(rebuilt.toSeq == toks1)
    // overlap: chunk k shares its first (size-stride) tokens with the
    // tail of chunk k-1
    val c = out(1L).map(_._4.split(" ").toSeq)
    assert(c(1).take(8) == c(0).drop(24).take(8))
    assert(out(2L).map(_._3).toSeq == Seq(3L))
    assert(out(3L).map(_._3).toSeq == Seq(1L))
    // chunk_idx is dense from 0
    assert(out(1L).map(_._2).toSeq == (0L until 5L))
  }

  test("Chunking: null text behaves as empty, no crash") {
    import spark.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "a b c")).toDF("doc_id", "text")
    val out = Chunking.chunk(docs, "doc_id", "text", 8, 8)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0)._4 == "" && out(1)._4 == "a b c")
  }

  test("text_chunk and text_hof_stats stay scan-local: zero exchanges") {
    for (name <- Seq("text_chunk", "text_hof_stats")) {
      val p = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      assert("(?<!Broadcast)Exchange ".r.findAllIn(p).isEmpty,
        s"$name must not shuffle:\n$p")
    }
  }

  test("Chunking: invalid size/stride rejected") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunking.chunk(docs, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](Chunking.chunk(docs, "doc_id", "text", 8, 0))
    intercept[IllegalArgumentException](Chunking.chunk(docs, "doc_id", "text", 8, 9))
  }

  test("q39 approx quartiles are within rank error of exact") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q39_approx_quantile")(spark, sf)
      .as[(String, Double, Double, Double)].collect()
      .map { case (f, p25, p50, p75) => f -> Seq(p25, p50, p75) }.toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice").as("x"))
      .as[(String, Double)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    for ((flag, qs) <- approx; (q, p) <- qs.zip(Seq(0.25, 0.5, 0.75))) {
      val xs = li(flag)
      // accuracy 10000 → rank error ≤ n/10000; allow 4x slack
      val tol = math.max(4 * xs.length / 10000, 1)
      val rank = xs.count(_ <= q)
      val target = (p * xs.length).round.toInt
      assert(math.abs(rank - target) <= tol,
        s"$flag p=$p approx=$q rank=$rank target=$target n=${xs.length}")
    }
  }
}

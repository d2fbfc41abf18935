package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GroupTests, Survival}
import graft.streaming.StreamCmh

/** Nelson–Aalen cumulative hazard ([[Survival.nelsonAalen]]): exact
  * ppm hand values, censoring semantics, KM risk-set parity, the
  * exp(−Ĥ) ≈ Ŝ sanity bound, invariance — plus the streaming CMH
  * twin ([[StreamCmh]]): streamed == batch, replay no-op, real
  * stream.
  */
class NelsonAalenSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand case: exact floored ppm increments and cumulation") {
    // group g: events at t=1 (n=4), t=3 (n=2, after a censor at 2)
    val df = Seq(("g", 1L, 1), ("g", 2L, 0), ("g", 3L, 1), ("g", 4L, 0))
      .toDF("g", "t", "e")
    val got = Survival.nelsonAalen(df, "g", "t", "e").collect()
    assert(got.length == 2)
    // t=1: d=1, n=4 → 250000; t=3: d=1, n=2 → 500000; cum 750000
    assert(got(0).getLong(1) == 1L && got(0).getAs[Long]("n_risk") == 4L
      && got(0).getAs[Long]("h_ppm") == 250000L
      && got(0).getAs[Long]("cumhaz_ppm") == 250000L)
    assert(got(1).getLong(1) == 3L && got(1).getAs[Long]("n_risk") == 2L
      && got(1).getAs[Long]("cumhaz_ppm") == 750000L)
    assert(got(1).getAs[Double]("cumhaz") == 0.75)
  }

  test("censoring shrinks the risk set without adding a step") {
    val df = Seq(("g", 1L, 1), ("g", 2L, 0), ("g", 2L, 0), ("g", 3L, 1))
      .toDF("g", "t", "e")
    val got = Survival.nelsonAalen(df, "g", "t", "e").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 3L)) // no step at 2
    assert(got(1).getAs[Long]("n_risk") == 1L)
  }

  test("risk sets match kaplanMeier's on the same data; exp(-H) ~ S") {
    val rows = (1 to 80).map(i =>
      ("g" + (i % 2), (i * 13 % 19 + 1).toLong, if (i % 5 == 0) 0 else 1))
    val df = rows.toDF("g", "t", "e")
    val na = Survival.nelsonAalen(df, "g", "t", "e").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("d")))).toMap
    val km = Survival.kaplanMeier(df, "g", "t", "e").collect()
    km.foreach { r =>
      assert(na((r.getString(0), r.getLong(1))) ==
        ((r.getAs[Long]("n_risk"), r.getAs[Long]("d"))))
    }
    // the classical bound: S(t) ≤ exp(−H(t)), close while d ≪ n
    val naCum = Survival.nelsonAalen(df, "g", "t", "e").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Double]("cumhaz")).toMap
    km.foreach { r =>
      val s = r.getAs[Double]("survival")
      val h = naCum((r.getString(0), r.getLong(1)))
      assert(s <= math.exp(-h) + 1e-6, s"S=$s exp(-H)=${math.exp(-h)}")
    }
  }

  test("partitioning invariance") {
    val rows = (1 to 100).map(i =>
      ("g" + (i % 3), (i * 7 % 23 + 1).toLong, i % 4 min 1))
    def run(parts: Int) =
      Survival.nelsonAalen(rows.toDF("g", "t", "e").repartition(parts),
        "g", "t", "e").collect().map(_.toString).toSeq
    assert(run(1) == run(11))
  }

  // ---- streaming CMH ----

  private val cmhRows = (1 to 120).map(i =>
    ("s" + (i % 3), i % 2 == 0, i % 5 < 2))

  test("StreamCmh: 3 streamed batches == batch; replay is a no-op") {
    val dir = Files.createTempDirectory("scmh").toString
    cmhRows.grouped(40).zipWithIndex.foreach { case (b, i) =>
      StreamCmh.applyBatch(b.toDF("g", "x", "y"), "g", "x", "y",
        dir, i.toLong)
    }
    val want = GroupTests.cmh(cmhRows.toDF("g", "x", "y"), "g", "x", "y")
      .head().toString
    assert(StreamCmh.cmh(spark, dir).head().toString == want)
    StreamCmh.applyBatch(cmhRows.take(40).toDF("g", "x", "y"),
      "g", "x", "y", dir, 1L)
    assert(StreamCmh.cmh(spark, dir).head().toString == want)
  }

  test("StreamCmh: real foreachBatch stream == batch") {
    val in = Files.createTempDirectory("scmh_in").toString
    cmhRows.take(60).toDF("g", "x", "y").write.parquet(s"$in/b1")
    cmhRows.drop(60).toDF("g", "x", "y").write.parquet(s"$in/b2")
    val dir = Files.createTempDirectory("scmh_state").toString
    val q = StreamCmh.start(
      spark.readStream.schema("g STRING, x BOOLEAN, y BOOLEAN")
        .option("maxFilesPerTrigger", "1").parquet(s"$in/*"),
      "g", "x", "y", dir, Files.createTempDirectory("scmh_ck").toString)
    q.processAllAvailable(); q.stop()
    assert(StreamCmh.cmh(spark, dir).head().toString ==
      GroupTests.cmh(cmhRows.toDF("g", "x", "y"), "g", "x", "y")
        .head().toString)
  }
}

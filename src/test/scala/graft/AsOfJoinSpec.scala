package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("as-of exec matches the window-over-union composition on real events") {
    val e = graft.sources.TableCatalog.events(spark, "/root/testdata/sf0.001")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), unix_micros($"ts").as("p_us"))
    val views = e.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("v_id"), $"value".as("v_value"),
        unix_micros($"ts").as("v_us"))

    val got = AsOfJoin(purchases, views, Seq("user_id"), Seq("p_us", "p_id"), Seq("v_us", "v_id"))
      .select($"p_id", $"v_id").as[(Long, Option[Long])].collect().toMap

    // reference: interleave both streams, carry the last view forward
    val tagged = e.filter($"event_type".isin("view", "purchase"))
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = tagged
      .withColumn("last_view", last(when($"event_type" === "view", $"event_id"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"last_view").as[(Long, Option[Long])].collect().toMap

    assert(got.nonEmpty)
    assert(got == want)
    // purchases with no prior view must appear with null right side
    assert(got.values.exists(_.isEmpty) == want.values.exists(_.isEmpty))
  }

  test("as-of exec plan: co-partitioned, sorted once, no window/range join") {
    val e = graft.sources.TableCatalog.events(spark, "/root/testdata/sf0.001")
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), unix_micros($"ts").as("p_us"))
    val v = e.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("v_id"), unix_micros($"ts").as("v_us"))
    val plan = AsOfJoin(p, v, Seq("user_id"), Seq("p_us", "p_id"), Seq("v_us", "v_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("as-of tolerance: stale matches null out, exact and in-window matches survive") {
    val lefts = Seq((1L, 100L, 10L), (1L, 150L, 11L), (1L, 1000L, 12L),
      (2L, 50L, 20L), (3L, 10L, 30L)).toDF("k", "l_us", "l_id")
    val rights = Seq((1L, 90L, 900L), (1L, 140L, 901L), (2L, 40L, 902L))
      .toDF("k", "r_us", "r_id")
    def run(tol: Option[Long]) =
      AsOfJoin(lefts, rights, Seq("k"), Seq("l_us", "l_id"), Seq("r_us", "r_id"), tol)
        .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toMap
    // unbounded: every left row keeps the latest earlier right row;
    // a key with no right rows at all yields null, not garbage
    assert(run(None) == Map(10L -> Some(900L), 11L -> Some(901L),
      12L -> Some(901L), 20L -> Some(902L), 30L -> None))
    // 20us window: the 860us-stale match for l_id=12 nulls out; the
    // 10us-gap matches survive
    assert(run(Some(20L)) == Map(10L -> Some(900L), 11L -> Some(901L),
      12L -> None, 20L -> Some(902L), 30L -> None))
    // tolerance demands a long first time column
    val bad = Seq((1L, "x", 1L)).toDF("k", "l_us", "l_id")
    assertThrows[IllegalArgumentException](
      AsOfJoin(bad, bad.toDF("k", "r_us", "r_id"), Seq("k"),
        Seq("l_us", "l_id"), Seq("r_us", "r_id"), Some(5L)))
  }

  test("forward direction: first right row at-or-after, tolerance bounds ahead-distance") {
    val lefts = Seq((1L, 100L, 10L), (1L, 150L, 11L), (1L, 1000L, 12L),
      (2L, 50L, 20L), (3L, 10L, 30L)).toDF("k", "l_us", "l_id")
    val rights = Seq((1L, 90L, 900L), (1L, 140L, 901L), (1L, 150L, 902L),
      (2L, 40L, 903L), (2L, 60L, 904L)).toDF("k", "r_us", "r_id")
    def run(tol: Option[Long]) =
      AsOfJoin(lefts, rights, Seq("k"), Seq("l_us", "l_id"), Seq("r_us", "r_id"),
          tol, direction = AsOfJoin.Forward)
        .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toMap
    // l=100 -> first right >= 100 is 140; l=150 -> exact match 150;
    // l=1000 -> nothing ahead; k=2 l=50 -> 60; k=3 -> no rights
    assert(run(None) == Map(10L -> Some(901L), 11L -> Some(902L),
      12L -> None, 20L -> Some(904L), 30L -> None))
    // 10us ahead-window: 140 is 40us ahead of 100 -> nulls out
    assert(run(Some(10L)) == Map(10L -> None, 11L -> Some(902L),
      12L -> None, 20L -> Some(904L), 30L -> None))
    // a forward match must not be consumed: both lefts at 140/150 can
    // share right rows, and earlier rights never match later lefts
    val dense = Seq((1L, 140L, 40L), (1L, 141L, 41L), (1L, 142L, 42L))
      .toDF("k", "l_us", "l_id")
    assert(AsOfJoin(dense, rights, Seq("k"), Seq("l_us", "l_id"),
        Seq("r_us", "r_id"), None, AsOfJoin.Forward)
      .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toMap ==
      Map(40L -> Some(901L), 41L -> Some(902L), 42L -> Some(902L)))
  }

  test("nearest direction: closest of both sides, ties to backward, tolerance both ways") {
    val lefts = Seq((1L, 100L, 10L), (1L, 115L, 11L), (1L, 500L, 12L),
      (2L, 50L, 20L)).toDF("k", "l_us", "l_id")
    val rights = Seq((1L, 90L, 900L), (1L, 130L, 901L), (2L, 45L, 902L), (2L, 55L, 903L))
      .toDF("k", "r_us", "r_id")
    def run(tol: Option[Long]) =
      AsOfJoin(lefts, rights, Seq("k"), Seq("l_us", "l_id"), Seq("r_us", "r_id"),
          tol, direction = AsOfJoin.Nearest)
        .select($"l_id", $"r_id").as[(Long, Option[Long])].collect().toMap
    // l=100: back 90 (10 away) beats fwd 130 (30 away); l=115: fwd 130
    // (15) beats back 90 (25); l=500: only back; k=2 l=50: 45 and 55
    // equidistant -> backward wins the tie
    assert(run(None) == Map(10L -> Some(900L), 11L -> Some(901L),
      12L -> Some(901L), 20L -> Some(902L)))
    // tolerance applies on both sides: 12 is 370us from its nearest
    assert(run(Some(20L)) == Map(10L -> Some(900L), 11L -> Some(901L),
      12L -> None, 20L -> Some(902L)))
    // nearest demands a long first time column
    val bad = Seq((1L, "x", 1L)).toDF("k", "l_us", "l_id")
    assertThrows[IllegalArgumentException](
      AsOfJoin(bad, bad.toDF("k", "r_us", "r_id"), Seq("k"),
        Seq("l_us", "l_id"), Seq("r_us", "r_id"), None, AsOfJoin.Nearest))
  }

  test("directions are partition-invariant: repartitioned inputs give identical results") {
    val e = graft.sources.TableCatalog.events(spark, "/root/testdata/sf0.001")
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), unix_micros($"ts").as("p_us"))
    val v = e.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("v_id"), unix_micros($"ts").as("v_us"))
    for (dir <- Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest)) {
      def run(lp: org.apache.spark.sql.DataFrame, rp: org.apache.spark.sql.DataFrame) =
        AsOfJoin(lp, rp, Seq("user_id"), Seq("p_us", "p_id"), Seq("v_us", "v_id"),
            None, dir)
          .select($"p_id", $"v_id").as[(Long, Option[Long])].collect().toMap
      val base = run(p, v)
      assert(base.nonEmpty)
      assert(run(p.repartition(17), v.repartition(3)) == base,
        s"direction=$dir not partition-invariant")
      assert(run(p.repartition(1), v.repartition(29, $"user_id")) == base,
        s"direction=$dir not partition-invariant (skewed layout)")
    }
  }

  test("as-of join rejects mismatched key types") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1, 5L)).toDF("k", "t") // int key vs long key
    val e = intercept[IllegalArgumentException] {
      AsOfJoin(l, r, Seq("k"), Seq("t"), Seq("t"))
    }
    assert(e.getMessage.contains("key column types"))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerKey
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  def orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("TopKPerKey matches window row_number on real data") {
    val topk = TopKPerKey(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 2)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val ref = orders.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    assert(topk == ref)
    assert(topk.nonEmpty)
  }

  test("TopKPerKey emits best-first within each key and handles k > group size") {
    val df = Seq((1L, 10.0, 1L), (1L, 30.0, 2L), (1L, 20.0, 3L), (2L, 5.0, 4L))
      .toDF("key", "score", "id")
    val rows = TopKPerKey(df, Seq("key"), Seq("score" -> true), 5)
      .select("key", "score").as[(Long, Double)].collect()
    val byKey = rows.groupBy(_._1)
    assert(byKey(1L).map(_._2).toSeq == Seq(30.0, 20.0, 10.0))
    assert(byKey(2L).map(_._2).toSeq == Seq(5.0))
  }

  test("rank column matches window row_number ranks exactly") {
    val topk = TopKPerKey(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 3, rankCol = Some("rank"))
      .select("o_custkey", "o_orderkey", "rank").as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val ref = orders.withColumn("rank", row_number().over(w).cast("long")).filter($"rank" <= 3)
      .select("o_custkey", "o_orderkey", "rank").as[(Long, Long, Long)].collect().toSet
    assert(topk == ref && topk.nonEmpty)
  }

  test("partial pass result is invariant to input partitioning") {
    val one = TopKPerKey(orders.repartition(1), Seq("o_custkey"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 2, rankCol = Some("rank"))
      .select("o_custkey", "o_orderkey", "rank").as[(Long, Long, Long)].collect().toSet
    val many = TopKPerKey(orders.repartition(13), Seq("o_custkey"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 2, rankCol = Some("rank"))
      .select("o_custkey", "o_orderkey", "rank").as[(Long, Long, Long)].collect().toSet
    assert(one == many && one.nonEmpty)
  }

  test("partial-pass flush path (tiny flush limit) still yields exact results") {
    // flushRows=4 forces many heap flushes per partition; the final
    // pass must re-reduce the over-emitted rows to the exact answer
    val topk = TopKPerKey(orders.repartition(3), Seq("o_custkey"),
      Seq("o_totalprice" -> true, "o_orderkey" -> false), 2,
      rankCol = Some("rank"), flushRows = 4)
      .select("o_custkey", "o_orderkey", "rank").as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val ref = orders.withColumn("rank", row_number().over(w).cast("long")).filter($"rank" <= 2)
      .select("o_custkey", "o_orderkey", "rank").as[(Long, Long, Long)].collect().toSet
    assert(topk == ref && topk.nonEmpty)
  }

  test("TopKPerKey plan contains the custom exec and exactly one exchange") {
    val plan = TopKPerKey(orders, Seq("o_custkey"), Seq("o_totalprice" -> true), 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey")) // exec renders without the Exec suffix
    assert("Exchange".r.findAllIn(plan).size == 1, s"expected one exchange:\n$plan")
    assert(!plan.contains("Sort"), s"must not sort:\n$plan")
  }

  test("approx_count_distinct stays within its error bound") {
    val got = graft.queries.Relational.q25ApproxDistinct(spark, "/root/testdata/sf0.01")
      .select("exact_orders", "approx_orders").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.05, s"HLL error $err too high (exact=$exact approx=$approx)")
    }
  }

  test("TopKPerKey rejects unknown columns with a clear error") {
    val e = intercept[Exception] {
      TopKPerKey(orders, Seq("nope"), Seq("o_totalprice" -> true), 1).collect()
    }
    assert(e.getMessage.contains("nope"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsOfJoin, TopKPerKey}
import org.scalatest.funsuite.AnyFunSuite

/** PushFilterThroughGraftNodes: key predicates above the custom
  * operators must reach the parquet scans (Catalyst stops at nodes it
  * doesn't know; the rule teaches it that both operators are per-key
  * independent).
  */
class PushdownRuleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def li: DataFrame = spark.read.parquet(s"$sf/lineitem.parquet")
    .select("l_returnflag", "l_orderkey", "l_quantity")

  private def topk(in: DataFrame): DataFrame =
    TopKPerKey(in, Seq("l_returnflag"),
      Seq("l_quantity" -> true, "l_orderkey" -> false), 5)

  test("key filter above TopKPerKey reaches the scan; results unchanged") {
    val filtered = topk(li).filter(col("l_returnflag") === "A")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,A)]")
      || plan.contains("EqualTo(l_returnflag,A)"), s"key filter not pushed to scan:\n$plan")

    val direct = topk(li.filter(col("l_returnflag") === "A"))
    assert(filtered.collect().toSet == direct.collect().toSet)
  }

  test("mixed conjunction: key part pushed, non-key part stays above the operator") {
    val f = topk(li).filter(col("l_returnflag") === "A" && col("l_quantity") > 10)
    val physical = f.queryExecution.executedPlan.toString
    assert(physical.contains("EqualTo(l_returnflag,A)"),
      s"key conjunct not pushed:\n$physical")
    // the quantity conjunct must NOT be pushed below the operator —
    // it would change which rows win the per-key top-k
    assert(!physical.contains("GreaterThan(l_quantity,10"),
      s"non-key conjunct wrongly pushed into the scan:\n$physical")
    val direct = topk(li.filter(col("l_returnflag") === "A"))
      .filter(col("l_quantity") > 10)
    assert(f.collect().toSet == direct.collect().toSet)
  }

  test("key filter above AsOfJoin pushes to BOTH sides' scans; results unchanged") {
    val e = graft.sources.TableCatalog.events(spark, sf)
    def purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"))
    def views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("v_id"),
        unix_micros(col("ts")).as("v_us"))

    val joined = AsOfJoin(purchases, views,
      Seq("user_id"), Seq("p_us", "p_id"), Seq("v_us", "v_id"))
      .filter(col("user_id") < 50)
    val physical = joined.queryExecution.executedPlan.toString
    val pushes = "LessThan\\(user_id,50\\)".r.findAllIn(physical).size
    assert(pushes >= 2, s"expected the key filter in both scans, found $pushes:\n$physical")

    val direct = AsOfJoin(purchases.filter(col("user_id") < 50),
      views.filter(col("user_id") < 50),
      Seq("user_id"), Seq("p_us", "p_id"), Seq("v_us", "v_id"))
    assert(joined.collect().toSet == direct.collect().toSet)
  }
}

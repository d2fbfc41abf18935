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

  test("key filter survives an intervening projection (even a rename) above TopKPerKey") {
    // Filter-over-Project-over-GraftNode: Catalyst's own
    // PushDownPredicates moves the (alias-substituted) filter below a
    // deterministic Project in the main batch, leaving
    // Filter-over-GraftNode for this rule — the two compose, so the
    // scan still prunes
    val renamed = topk(li).select(col("l_returnflag").as("flag"),
      col("l_orderkey"), col("l_quantity"))
      .filter(col("flag") === "A")
    val plan = renamed.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(l_returnflag,A)"),
      s"key filter lost through the projection:\n$plan")
    val direct = topk(li.filter(col("l_returnflag") === "A"))
      .select(col("l_returnflag").as("flag"), col("l_orderkey"), col("l_quantity"))
    assert(renamed.collect().toSet == direct.collect().toSet)
  }

  test("nondeterministic projection blocks the pushdown (Spark-aligned), results still correct") {
    // a rand() column between the filter and the operator: Catalyst
    // never moves deterministic filters below nondeterministic
    // projections (the evaluation set would change), and this rule
    // keeps that contract rather than trading reproducibility for
    // pruning — pinned so a future 'optimization' can't silently
    // change semantics
    val f = topk(li).withColumn("r", rand(7)).filter(col("l_returnflag") === "A")
    // the scan-pushed form (PushedFilters syntax) must be absent; the
    // filter instead evaluates above the projection
    val plan = f.queryExecution.executedPlan.toString
    assert(!plan.contains("EqualTo(l_returnflag,A)"),
      s"filter pushed through a nondeterministic projection:\n$plan")
    assert(f.select("l_returnflag").distinct().collect().map(_.getString(0)).toSeq == Seq("A"))
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

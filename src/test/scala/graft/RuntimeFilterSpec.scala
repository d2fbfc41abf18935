package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark's runtime Bloom-filter injection: a selective dim side gets
  * a bloom filter built at runtime and pushed into the fact scan, so
  * most fact rows die before the shuffle (SURVEY.md §5). Thresholds
  * are lowered so local-scale data triggers the same rewrite a
  * 100 TB fact table would.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("runtime bloom filter prunes the fact side of a selective join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      val sel = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        .filter($"o_totalprice" > 400000.0) // highly selective dim side
      val joined = li.join(sel, $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_quantity", $"o_totalprice")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected a runtime bloom filter in the plan:\n$plan")
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints `.explain("formatted")` for selected queries so the plan
  * shape can be audited: filters/projections must reach the parquet
  * scan (PushedFilters / ReadSchema), dim joins must broadcast, and
  * merges must shuffle exactly once on the entity key.
  *
  * {{{ sbt "runMain graft.tools.ExplainAudit q2_filter_pushdown q3_top_orders" }}}
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n===== $name =====")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Times named driver-contract queries N times each (default 3) —
  * the targeted counterpart of `graft.Bench` for A/B-ing one
  * operator without paying for the whole suite.
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.TimeQuery 3 dedup_ngram_jaccard" }}}
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the Bench resetState convention: checkpoint blocks, cached
    // plans and streaming state survive each query and poison later
    // ones' timing windows (measured: q134 read 10-22 s in a 10-query
    // run vs 2.7-3.4 s isolated)
    def resetState(): Unit = {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      resetState(); System.gc()
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-24s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f")
    }
    spark.stop()
  }
}

package graft.tools

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-JOB wall-clock breakdown of a driver-contract query — the
  * measurement ExplainAudit cannot give for the iterative operators
  * (PageRank, Louvain, the fused-cumulation battery), where one
  * query is a driver loop over many Spark jobs and the aggregate
  * bench number says nothing about WHICH pass is slow.
  *
  * Warm-up run first (JIT, codegen, parquet footers — the Bench
  * convention), then a timed run with a listener recording each job's
  * wall time, call site and per-stage shuffle/input volumes.
  *
  * {{{ SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ProfileQuery graph_pagerank" }}}
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Seq("graph_pagerank")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // the Bench r10 lesson: the default SQL status store retains
      // 1000 executions and the resulting GC pressure inflates later
      // queries ~3x — keep only a handful
      .config("spark.sql.ui.retainedExecutions", "4")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .config("spark.appStateStore.asyncTracking.enable", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def resetState(): Unit = {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
    }

    case class Job(id: Int, site: String, t0: Long,
                   var sec: Double = 0.0)
    val jobs = TrieMap[Int, Job]()
    val order = ArrayBuffer[Int]()
    val stageLines = ArrayBuffer[String]()
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (recording) {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          jobs(js.jobId) = Job(js.jobId, site, System.nanoTime())
          order.synchronized { order += js.jobId }
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.get(je.jobId).foreach { j =>
          j.sec = (System.nanoTime() - j.t0) / 1e9
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (recording) {
          val si = sc.stageInfo
          val m = si.taskMetrics
          val dur = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield (c - s) / 1e3).getOrElse(0.0)
          val line = f"    stage ${si.stageId}%4d $dur%6.2fs ${si.numTasks}%4d tasks " +
            f"in=${m.inputMetrics.bytesRead / 1e6}%8.1fMB " +
            f"sRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
            f"sWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
            s"${si.name.take(60)}"
          stageLines.synchronized { stageLines += line }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up (untimed)
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"[profile] $name warmup failed: $e") }
      resetState(); System.gc()
      jobs.clear(); order.clear(); stageLines.clear()
      recording = true
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"[profile] $name failed: $e") }
      val total = (System.nanoTime() - t0) / 1e9
      recording = false
      Thread.sleep(500) // drain listener bus
      println(f"\n===== $name total=$total%.2fs jobs=${order.size} =====")
      val js = order.synchronized { order.toVector }.flatMap(jobs.get)
      js.foreach { j =>
        println(f"  job ${j.id}%4d ${j.sec}%6.2fs  ${j.site}")
      }
      val accounted = js.map(_.sec).sum
      println(f"  [sum of jobs $accounted%.2fs; gap (driver/planning) ${total - accounted}%.2fs]")
      if (sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1"))
        stageLines.synchronized { stageLines.foreach(println) }
      resetState(); System.gc()
    }
    spark.stop()
  }
}

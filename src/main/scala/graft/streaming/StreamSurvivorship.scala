package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sinks.TableVersions

/** STREAMING golden-record maintenance — the streaming twin of
  * `cdc.Survivorship.goldenRecord` (q129): a continuously-merged
  * per-entity record where each FIELD independently keeps its latest
  * non-null value.
  *
  * The per-field rule is a lexicographic arg-max over (seq…, value)
  * structs — a commutative, associative, idempotent-under-max monoid
  * — so state is ONE candidate struct per (key, field), folded per
  * microbatch: the batch collapses to its own per-key candidates
  * first (map-side partials), then one union + re-max against the
  * state. History is never re-read.
  *
  * `n_updates` is a SUM (not idempotent), so redelivered batchIds are
  * skipped via the committed `_batchid` marker — the StreamOhlc
  * guard. Publication via [[TableVersions]] (staging + atomic commit
  * marker); [[golden]] projects the batch-identical surface from
  * state on demand.
  */
object StreamSurvivorship {

  def start(stream: DataFrame, keyCol: String, seqCols: Seq[String],
            fields: Seq[String], dir: String,
            checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, keyCol, seqCols, fields, dir, Some(batchId))
        ()
      }
      .start()

  private def candName(f: String) = s"__c_$f"

  /** Collapse rows to one candidate struct per (key, field) plus the
    * summable tallies — the mergeable state shape.
    */
  private def collapse(df: DataFrame, keyCol: String, seqCols: Seq[String],
                       fields: Seq[String]): DataFrame = {
    val picks = fields.map { f =>
      max(when(col(f).isNotNull,
        struct(seqCols.map(col) :+ col(f).as("__v"): _*)))
        .as(candName(f))
    }
    val aggs = picks ++ Seq(
      sum(col("__n")).cast("bigint").as("__n"),
      max(col("__last")).as("__last"))
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** One microbatch of raw update rows; factored out for replay tests
    * and batch callers.
    */
  def applyBatch(batch: DataFrame, keyCol: String, seqCols: Seq[String],
                 fields: Seq[String], dir: String,
                 batchId: Option[Long] = None): Unit = {
    require(seqCols.nonEmpty && fields.nonEmpty,
      "StreamSurvivorship: need seq and field columns")
    val spark = batch.sparkSession
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = TableVersions.current(fs, root)
    val lastApplied = cur.flatMap(v => TableVersions.readSmall(
        fs, new Path(TableVersions.dataDir(root, v), "_batchid")))
      .flatMap(s => scala.util.Try(s.toLong).toOption)
    if (batchId.exists(id => lastApplied.exists(id <= _))) return
    val delta = collapse(
      batch.withColumn("__n", lit(1L))
        .withColumn("__last", col(seqCols.head)),
      keyCol, seqCols, fields)
    val input = cur match {
      case Some(v) =>
        // state candidates re-enter as (seq…, value) structs: max over
        // the union is exactly the arg-max over everything seen
        spark.read.parquet(
            new Path(TableVersions.dataDir(root, v), "golden").toString)
          .unionByName(delta)
      case None => delta
    }
    val merged = {
      val picks = fields.map(f => max(col(candName(f))).as(candName(f)))
      val aggs = picks ++ Seq(
        sum(col("__n")).cast("bigint").as("__n"),
        max(col("__last")).as("__last"))
      input.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    }
    val pending = TableVersions.begin(fs, root)
    merged.write.parquet(new Path(pending.dir, "golden").toString)
    batchId.foreach(id => TableVersions.writeSmall(
      fs, new Path(pending.dir, "_batchid"), id.toString))
    TableVersions.commit(fs, root, pending)
    TableVersions.prune(fs, root, keep = 4)
  }

  /** The maintained per-key candidate state (struct form). */
  def state(spark: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = TableVersions.current(fs, root).getOrElse(
      throw new IllegalStateException(
        s"StreamSurvivorship($dir): no committed state yet"))
    spark.read.parquet(new Path(TableVersions.dataDir(root, v), "golden").toString)
  }

  /** The batch-identical golden-record surface: per key, each field's
    * surviving value + n_updates + last_seen (== `Survivorship
    * .goldenRecord` over everything streamed so far).
    */
  def golden(spark: SparkSession, dir: String, keyCol: String,
             fields: Seq[String]): DataFrame = {
    val s = state(spark, dir)
    val cols = Seq(col(keyCol)) ++
      fields.map(f => col(candName(f)).getField("__v").as(f)) ++
      Seq(col("__n").as("n_updates"), col("__last").as("last_seen"))
    s.select(cols: _*)
  }
}

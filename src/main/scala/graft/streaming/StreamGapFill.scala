package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING time-series gap fill — the incremental form of the
  * batch `q35_gap_fill` query: each key's daily series is emitted
  * densely (missing days filled last-observation-carried-forward),
  * one increment per micro-batch, so a downstream consumer always
  * sees a gapless series without ever recomputing history.
  *
  * Per micro-batch: the batch collapses to per-(key, day) points; the
  * per-key LAST emitted point is fetched from a [[BucketedCdcState]]
  * table (reading ONLY the buckets the batch's keys hash into), the
  * batch's new days are emitted — gaps between consecutive points
  * carry the earlier point's value forward, and the span between the
  * state point and the batch's first day is filled the same way —
  * and the state table latest-wins merges the batch's points
  * (rewriting only touched buckets, snapshot-chain commit). Per-batch
  * cost is O(batch + touched buckets), never O(all keys): the
  * naive "keep a last-value map for every key and rewrite it per
  * batch" design this replaces is the same scale-killer the bucketed
  * CDC state exists to fix.
  *
  * Emissions land in per-batch-id output dirs (overwrite → a replay
  * reproduces its own increment; the state merge is latest-wins and
  * therefore also replay-idempotent). With day-ordered batches the
  * union of all increments equals the batch gap-fill exactly
  * (spec'd); out-of-order days within a key are merged by the
  * latest-wins sequence, matching the batch operator's max-per-day
  * semantics.
  */
object StreamGapFill {

  def start(eventsStream: DataFrame, keyCol: String, tsCol: String,
            valCol: String, outDir: String, stateRoot: String,
            checkpointDir: String, numBuckets: Int = 64): StreamingQuery = {
    eventsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, keyCol, tsCol, valCol, outDir, stateRoot,
          batchId, numBuckets)
        ()
      }
      .start()
  }

  /** One micro-batch; factored out for replay and direct use. */
  def applyBatch(batch: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, outDir: String, stateRoot: String,
                 batchId: Long, numBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    val daily = batch
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(max(col(valCol)).as("day_value"))
      .persist() // bucket collect + emission + state merge share it
    try {
      val touched = daily
        .select(BucketedCdcState.bucketOf(Seq(keyCol), numBuckets).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      if (touched.isEmpty) return

      // last emitted point per key AS OF the previous batch (versions
      // are tagged with their batch id, so a REPLAY of this batch
      // anchors to the same pre-batch snapshot its first attempt saw,
      // not to the state that attempt already committed); co-bucketed
      // keys absent from this batch ride along but emit nothing
      val prev = BucketedCdcState
        .statePartialBefore(spark, stateRoot, touched, beforeTag = batchId)
        .map(_.select(col(keyCol), col("day"), col("day_value"))
          .withColumn("from_state", lit(true)))
      val pts = prev match {
        case Some(p) => p.unionByName(daily.withColumn("from_state", lit(false)))
        case None    => daily.withColumn("from_state", lit(false))
      }

      val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      val nxt = lead(col("day"), 1).over(w)
      // a state point's day is already emitted: its fill starts the
      // day after; a batch point emits itself and fills to the day
      // before the next point
      val filled = pts
        .withColumn("start", when(col("from_state"), date_add(col("day"), 1))
          .otherwise(col("day")))
        .withColumn("stop", when(nxt.isNull, col("day"))
          .otherwise(date_sub(nxt, 1)))
        .filter(col("start") <= col("stop"))
        .select(col(keyCol),
          explode(sequence(col("start"), col("stop"))).as("day"),
          col("day_value").as("value_filled"))

      filled.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      // latest-wins by day: the state table's sequence IS the day;
      // the commit is tagged with this batch id (the replay anchor)
      BucketedCdcState.applyBatch(daily, stateRoot,
        keyCols = Seq(keyCol), seqCols = Seq("day"), numBuckets = numBuckets,
        tag = Some(batchId))
      BucketedCdcState.prune(spark, stateRoot)
    } finally daily.unpersist()
  }

  /** All filled rows emitted so far. */
  def results(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(outDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_"))
      .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .filter { st =>
        val it = fs.listFiles(st.getPath, true)
        var found = false
        while (!found && it.hasNext)
          found = it.next().getPath.getName.endsWith(".parquet")
        found
      }
      .map(_.getPath.toString)
    require(dirs.nonEmpty, s"no output batches under $outDir")
    dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }
}

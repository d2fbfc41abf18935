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
  * therefore also replay-idempotent). A day present in BOTH carried
  * state and the current batch (normal when several micro-batches
  * cover one day) is merged per (key, day) to the larger value BEFORE
  * the fill window — q35's max-per-day semantics — and, when the
  * merged value exceeds what was already emitted, the day is
  * re-emitted as a correction; [[results]] resolves per (key, day) to
  * the newest batch's row, so the union of increments stays
  * duplicate-free and equals the batch gap-fill (spec'd, including
  * batches sharing a day). Days arriving AFTER a later day was
  * already emitted (out-of-order across batches) are latest-wins
  * approximate: the late batch's fill overwrites the span it covers,
  * which matches batch semantics unless an intermediate point between
  * the late day and the state's day had already been emitted —
  * exactness there needs retraction, which no consumer requires yet.
  */
object StreamGapFill {

  /** Consolidation cadence for the per-batch OUTPUT dirs (state is a
    * [[BucketedCdcState]] snapshot chain with its own prune).
    */
  val DefaultCompactEvery = 64

  def start(eventsStream: DataFrame, keyCol: String, tsCol: String,
            valCol: String, outDir: String, stateRoot: String,
            checkpointDir: String, numBuckets: Int = 64,
            compactEvery: Int = DefaultCompactEvery): StreamingQuery = {
    eventsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, keyCol, tsCol, valCol, outDir, stateRoot,
          batchId, numBuckets, compactEvery)
        ()
      }
      .start()
  }

  /** One micro-batch; factored out for replay and direct use. */
  def applyBatch(batch: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, outDir: String, stateRoot: String,
                 batchId: Long, numBuckets: Int = 64,
                 compactEvery: Int = DefaultCompactEvery): Unit = {
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      BatchDirs.consolidate(spark, outDir, batchId,
        merge = resolve, idCol = Some(BatchCol))
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
        .map(_.select(col(keyCol), col("day"),
          col("day_value").as("state_value")))

      // merge state and batch points per (key, day) BEFORE the fill
      // window — a day in both resolves deterministically to the
      // larger value (q35's max-per-day rule) instead of a
      // nondeterministic window tie that either loses the update or
      // emits conflicting duplicates. `state_value` records what was
      // already emitted for the day (null = nothing).
      val valueType = daily.schema("day_value").dataType
      val pts = prev match {
        case Some(p) =>
          daily.join(p, Seq(keyCol, "day"), "full_outer")
            .select(col(keyCol), col("day"),
              greatest(coalesce(col("day_value"), col("state_value")),
                coalesce(col("state_value"), col("day_value")))
                .as("day_value"),
              col("state_value"))
        case None =>
          daily.withColumn("state_value", lit(null).cast(valueType))
      }

      val w = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      val nxt = lead(col("day"), 1).over(w)
      // days are now unique per key, so the window order is total. A
      // day whose merged value equals what state already emitted
      // starts filling the day after; a new day — or an already-
      // emitted day whose value grew (correction) — emits itself too
      val alreadyEmitted =
        col("state_value").isNotNull && col("day_value") === col("state_value")
      val filled = pts
        .withColumn("start", when(alreadyEmitted, date_add(col("day"), 1))
          .otherwise(col("day")))
        .withColumn("stop", when(nxt.isNull, col("day"))
          .otherwise(date_sub(nxt, 1)))
        .filter(col("start") <= col("stop"))
        .select(col(keyCol),
          explode(sequence(col("start"), col("stop"))).as("day"),
          col("day_value").as("value_filled"))

      filled.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      // latest-wins by (day, day_value): the value tiebreak makes a
      // same-day re-merge deterministic (keep the max, q35 semantics);
      // the commit is tagged with this batch id (the replay anchor)
      BucketedCdcState.applyBatch(daily, stateRoot,
        keyCols = Seq(keyCol), seqCols = Seq("day", "day_value"),
        numBuckets = numBuckets, tag = Some(batchId))
      BucketedCdcState.prune(spark, stateRoot)
    } finally daily.unpersist()
  }

  private val BatchCol = "__batch"

  /** Latest-wins per (key, day) across batch increments: a correction
    * row emitted by a later batch (same-day value grew) supersedes the
    * original emission, so the result is duplicate-free.
    */
  private def resolve(df: DataFrame): DataFrame = {
    val keys = df.columns
      .filterNot(Set("day", "value_filled", BatchCol).contains).toSeq
    df.groupBy((keys :+ "day").map(col): _*)
      .agg(max(struct(col(BatchCol), col("value_filled"))).as("__m"))
      .select((keys.map(col) :+ col("day") :+
        col(s"__m.value_filled").as("value_filled")): _*)
  }

  /** All filled rows emitted so far, corrections resolved. */
  def results(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    resolve(BatchDirs.read(spark, outDir, idCol = Some(BatchCol)))
}

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
  * key's EMITTED POINTS (one state row per (key, day), bucketed by
  * key so a series' history stays co-bucketed) are fetched from a
  * [[BucketedCdcState]] table reading ONLY the buckets the batch's
  * keys hash into, then only the UNSETTLED spans are emitted — a
  * point's forward fill is emitted when the point is new or corrected,
  * or when a new point lands right after it (shortening its open
  * span); spans between two previously-known points were already
  * emitted and are skipped. The state table latest-wins merges the
  * batch's points per (key, day) (rewriting only touched buckets,
  * snapshot-chain commit). Per-batch cost is O(batch + touched
  * buckets' retained history), never O(all keys).
  *
  * OUT-OF-ORDER arrivals are EXACT within `latenessHorizonDays`:
  * because state keeps each emitted point (not just the newest), a
  * day arriving after later days were emitted fills only up to its
  * true next neighbor, and the spans of older neighbors stay
  * untouched — no retraction needed, the consumer-facing [[results]]
  * resolve already takes the newest emission per (key, day). Points
  * older than the horizon (relative to their key's newest day) are
  * trimmed from state to bound bucket-rewrite I/O; a straggler older
  * than THAT degrades to the previous latest-wins-approximate fill
  * (it may overwrite intermediate days the trimmed points would have
  * bounded). Size the horizon to the pipeline's real allowed
  * lateness, exactly like a watermark.
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
  * batches sharing a day and out-of-order days across batches).
  */
object StreamGapFill {

  /** Consolidation cadence for the per-batch OUTPUT dirs (state is a
    * [[BucketedCdcState]] snapshot chain with its own prune).
    */
  val DefaultCompactEvery = 64

  def start(eventsStream: DataFrame, keyCol: String, tsCol: String,
            valCol: String, outDir: String, stateRoot: String,
            checkpointDir: String, numBuckets: Int = 64,
            compactEvery: Int = DefaultCompactEvery,
            latenessHorizonDays: Int = DefaultLatenessHorizonDays,
            perDayCompaction: Boolean = false): StreamingQuery = {
    eventsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, keyCol, tsCol, valCol, outDir, stateRoot,
          batchId, numBuckets, compactEvery, latenessHorizonDays,
          perDayCompaction)
        ()
      }
      .start()
  }

  /** State keeps each key's emitted points for this many days behind
    * the key's newest day — the exactness window for out-of-order
    * arrivals AND the bound on per-bucket state size.
    */
  val DefaultLatenessHorizonDays = 365

  /** One micro-batch; factored out for replay and direct use.
    *
    * `perDayCompaction = true` selects [[BatchDirs.consolidatePartitioned]]
    * for the output dirs: increments fold into a `parts/day=...` layout
    * where a consolidation rewrites only the day partitions the merged
    * batches touched. For a long-running dense daily series this bounds
    * per-compact rewrite I/O by the lateness window (new days + the
    * corrected tail), where the tiered compact chain still periodically
    * rewrites the whole series; it also gives downstream day-range
    * readers partition pruning for free. Default stays the tiered
    * chain for compatibility with existing layouts (a stream can flip
    * the flag in place — legacy compacts are absorbed on the next
    * consolidation).
    */
  def applyBatch(batch: DataFrame, keyCol: String, tsCol: String,
                 valCol: String, outDir: String, stateRoot: String,
                 batchId: Long, numBuckets: Int = 64,
                 compactEvery: Int = DefaultCompactEvery,
                 latenessHorizonDays: Int = DefaultLatenessHorizonDays,
                 perDayCompaction: Boolean = false): Unit = {
    val spark = batch.sparkSession
    require(latenessHorizonDays >= 0, "latenessHorizonDays must be >= 0")
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      if (perDayCompaction)
        BatchDirs.consolidatePartitioned(spark, outDir, batchId,
          partCol = "day", merge = resolveKeepBatch, idCol = BatchCol)
      else
        BatchDirs.consolidate(spark, outDir, batchId,
          merge = resolve, idCol = Some(BatchCol))
    }
    val daily = batch
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(max(col(valCol)).as("day_value"))
      .persist() // bucket collect + emission + state merge share it
    try {
      val touched = daily
        .select(BucketedCdcState.bucketOf(Seq(keyCol), numBuckets).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      if (touched.isEmpty) return

      // the emitted points of this batch's keys AS OF the previous
      // batch (versions are tagged with their batch id, so a REPLAY of
      // this batch anchors to the same pre-batch snapshot its first
      // attempt saw, not to the state that attempt already committed);
      // co-bucketed keys absent from this batch ride along in the
      // bucket read but are dropped here — with per-(key, day) state
      // they would otherwise re-enter the fill window every batch
      val prev = BucketedCdcState
        .statePartialBefore(spark, stateRoot, touched, beforeTag = batchId)
        .map(_.select(col(keyCol), col("day"),
          col("day_value").as("state_value"))
          .join(daily.select(keyCol).distinct(), Seq(keyCol), "left_semi"))

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
      // days are unique per key, so the window order is total. A point
      // is "fresh" when it is new to state or its merged value grew (a
      // correction); a known, unchanged point starts filling the day
      // after itself. Only UNSETTLED spans are emitted: a fresh point
      // always emits its span; a known point's span was already
      // emitted the moment its next neighbor arrived, so it re-emits
      // only when that neighbor is fresh (the span between two known
      // points is settled; the open span past the newest known point
      // is closed exactly once, by the batch that lands after it).
      // This is what makes out-of-order arrival exact: a late day
      // fills only up to its true next neighbor, and settled spans of
      // older points stay untouched.
      val filled = pts
        .withColumn("__fresh",
          col("state_value").isNull || col("day_value") =!= col("state_value"))
        .withColumn("__next_fresh",
          coalesce(lead(col("__fresh"), 1).over(w), lit(false)))
        .withColumn("start", when(col("__fresh"), col("day"))
          .otherwise(date_add(col("day"), 1)))
        .withColumn("stop", when(nxt.isNull, col("day"))
          .otherwise(date_sub(nxt, 1)))
        .filter(col("__fresh") || col("__next_fresh"))
        .filter(col("start") <= col("stop"))
        .select(col(keyCol),
          explode(sequence(col("start"), col("stop"))).as("day"),
          col("day_value").as("value_filled"))

      filled.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      // one state row per (key, day), max value per day (q35
      // semantics), bucketed by key so a series' points stay
      // co-bucketed; points older than the lateness horizon (relative
      // to their key's newest day) are trimmed so a bucket rewrite is
      // O(keys x horizon), not O(all history). The commit is tagged
      // with this batch id (the replay anchor).
      val trim: DataFrame => DataFrame = merged => {
        val wk = Window.partitionBy(col(keyCol))
        merged.withColumn("__maxd", max(col("day")).over(wk))
          .filter(datediff(col("__maxd"), col("day")) <= latenessHorizonDays)
          .drop("__maxd")
      }
      BucketedCdcState.applyBatch(daily, stateRoot,
        keyCols = Seq(keyCol, "day"), seqCols = Seq("day_value"),
        numBuckets = numBuckets, tag = Some(batchId),
        bucketCols = Seq(keyCol), postMerge = trim)
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

  /** [[resolve]] that KEEPS the winning batch id — the consolidated
    * per-day partitions must retain each row's emission id so a later
    * batch-dir row (higher id) still wins the next latest-wins pass.
    */
  private def resolveKeepBatch(df: DataFrame): DataFrame = {
    val keys = df.columns
      .filterNot(Set("day", "value_filled", BatchCol).contains).toSeq
    df.groupBy((keys :+ "day").map(col): _*)
      .agg(max(struct(col(BatchCol), col("value_filled"))).as("__m"))
      .select((keys.map(col) :+ col("day") :+
        col(s"__m.value_filled").as("value_filled") :+
        col(s"__m.$BatchCol").as(BatchCol)): _*)
  }

  /** All filled rows emitted so far, corrections resolved. Reads
    * whichever consolidation layout the stream uses (the per-day
    * `parts/` subtree when present, else the tiered chain).
    */
  def results(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val (fs, root) = BatchDirs.fsOf(spark, outDir)
    val hasParts =
      fs.exists(new org.apache.hadoop.fs.Path(root, "parts")) ||
      fs.exists(root) && fs.listStatus(root)
        .exists(_.getPath.getName.startsWith("parts_stage_"))
    if (hasParts)
      resolve(BatchDirs.readPartitioned(spark, outDir, "day", BatchCol))
    else resolve(BatchDirs.read(spark, outDir, idCol = Some(BatchCol)))
  }
}

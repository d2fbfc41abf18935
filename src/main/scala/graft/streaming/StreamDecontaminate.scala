package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Decontaminate

/** Streaming benchmark decontamination: a continuously-arriving
  * corpus is probed against a STATIC benchmark set and survivors are
  * appended as they arrive — the streaming form of
  * [[graft.operators.Decontaminate]] (`text_decontaminate`).
  *
  * The probe shingle-hash set is computed ONCE and cached; every
  * microbatch broadcast-joins it (benchmark sets are small by
  * construction), so per-batch cost is one scan of the batch plus the
  * per-doc aggregate — no state store, no watermark, nothing grows
  * with stream length. Survivors land in `outDir/batch_<id>`,
  * OVERWRITTEN per batch id, so a microbatch replay after a failure
  * rewrites the same directory instead of duplicating rows
  * (effectively-once with the file source's replayed batch ids).
  */
object StreamDecontaminate {

  def start(corpusStream: DataFrame, probes: DataFrame,
            idCol: String, textCol: String,
            outDir: String, checkpointDir: String,
            maxFraction: Double = 0.2, n: Int = 3): StreamingQuery = {
    val spark = corpusStream.sparkSession
    val probeShingles = Decontaminate.probeSet(probes, textCol, n).cache()
    val q = try {
      corpusStream.writeStream
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          Decontaminate
            .decontaminateAgainst(batch, probeShingles, idCol, textCol, maxFraction, n)
            .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
          ()
        }
        .start()
    } catch {
      // a start() failure would otherwise leak the probe cache forever
      case e: Throwable => probeShingles.unpersist(); throw e
    }
    // release the probe cache when the query ends — without this every
    // start() pins a cached DataFrame for the life of the session
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(event: QueryStartedEvent): Unit = ()
      override def onQueryProgress(event: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
        if (event.id == q.id) {
          probeShingles.unpersist()
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    q
  }

  /** Read back everything the stream has kept so far. */
  def survivors(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/batch_*")
}

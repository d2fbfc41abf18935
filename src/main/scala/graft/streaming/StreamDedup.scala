package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exactly-once deduplication: `dropDuplicates` on a
  * streaming DataFrame keeps per-key state so re-delivered records
  * (at-least-once sources, replays) are emitted once. The watermark
  * bounds the state: keys older than the horizon are forgotten, so
  * state size is O(keys per watermark window), not O(stream).
  */
object StreamDedup {

  /** Dedup a stream on `keyCols`, bounding state by event time on
    * `tsCol` with `watermark` (e.g. "1 hour").
    */
  def dedup(stream: DataFrame, keyCols: Seq[String],
            tsCol: String, watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Unbounded-state variant (exact, for bounded replays/tests). */
  def dedupUnbounded(stream: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.dropDuplicates(keyCols)
}

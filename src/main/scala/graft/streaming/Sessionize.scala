package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization with
  * `flatMapGroupsWithState` (SURVEY.md §2a row 18 family): the
  * streaming counterpart of the batch `q17_sessionize` window query.
  *
  * Custom per-key state: the currently-open session. A new event
  * within `gapSeconds` of the session end extends it; a later event
  * closes it and emits the finished session. Open sessions remain in
  * state until closed by a later event (a production job would add an
  * event-time timeout to flush idle sessions; on a finite replay the
  * open tail is intentionally unemitted, which the spec exploits).
  *
  * Events inside one trigger are sorted by (ts, event_id) before
  * folding, so intra-batch disorder is handled; cross-batch disorder
  * is the watermark's job.
  */
object Sessionize {

  case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

  case class OpenSession(sessionNo: Long, startUs: Long, endUs: Long,
                         nEvents: Long, sumValue: Double)

  case class ClosedSession(user_id: Long, session_no: Long, n_events: Long,
                           session_start: Timestamp, session_end: Timestamp,
                           sum_value: Double)

  def fold(gapUs: Long)(userId: Long, events: Iterator[SessionEvent],
                        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var open = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L
      open match {
        case Some(s) if us - s.endUs <= gapUs =>
          open = Some(s.copy(endUs = us, nEvents = s.nEvents + 1,
            sumValue = s.sumValue + e.value))
        case Some(s) =>
          closed += ClosedSession(userId, s.sessionNo, s.nEvents,
            new Timestamp(s.startUs / 1000L), new Timestamp(s.endUs / 1000L), s.sumValue)
          open = Some(OpenSession(s.sessionNo + 1, us, us, 1L, e.value))
        case None =>
          open = Some(OpenSession(1L, us, us, 1L, e.value))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Wire the fold over a (possibly streaming) typed event Dataset. */
  def sessions(events: Dataset[SessionEvent], gapSeconds: Long): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fold(gapSeconds * 1000000L))
  }

  /** Production variant: sessions also FLUSH on event-time timeout —
    * when the watermark passes (session end + gap) with no new events,
    * the open session is emitted and its state dropped, so idle keys
    * do not pin state forever. Requires a watermark on `ts` upstream.
    */
  def foldWithTimeout(gapUs: Long)(userId: Long, events: Iterator[SessionEvent],
                                   state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(ClosedSession(userId, s.sessionNo, s.nEvents,
        new Timestamp(s.startUs / 1000L), new Timestamp(s.endUs / 1000L), s.sumValue))
    }
    val out = fold(gapUs)(userId, events, state)
    state.getOption.foreach { s =>
      state.setTimeoutTimestamp((s.endUs + gapUs) / 1000L) // millis
    }
    out
  }

  /** Wire the timeout-flushing fold; `events` must already carry a
    * watermark on `ts`.
    */
  def sessionsWithTimeout(events: Dataset[SessionEvent],
                          gapSeconds: Long): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        foldWithTimeout(gapSeconds * 1000000L))
  }

  /** Run the streaming sessionizer to a memory sink until drained. */
  def runToMemory(spark: SparkSession, out: Dataset[ClosedSession],
                  queryName: String): Dataset[ClosedSession] = {
    import spark.implicits._
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName).as[ClosedSession]
  }
}

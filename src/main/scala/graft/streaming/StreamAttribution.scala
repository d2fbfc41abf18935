package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming marketing attribution with
  * `flatMapGroupsWithState` — the streaming counterpart of the batch
  * `q75_attribution` windows: every purchase is credited to the
  * user's FIRST and LAST prior touch (click/view), and the credit is
  * known the moment the purchase arrives, not at end-of-day batch.
  *
  * Per-key state is two strings (the first touch ever seen, the
  * latest touch so far) — O(1) per user, no event history retained:
  * the reason this is a fold and not a replayed window. Events
  * inside one trigger are sorted by (ts, event_id) — the same total
  * order the batch window uses — so intra-batch disorder is handled;
  * cross-batch disorder is the delivery contract's job (time-ordered
  * ingestion, as in CDC batch sequences).
  *
  * Scale shape: state store carries two short strings per user;
  * purchases stream out append-only. At 100 TB of events the state
  * is |users|-sized, the per-trigger cost one shuffle on user_id.
  */
object StreamAttribution {

  case class TouchEvent(user_id: Long, event_id: Long, ts: Timestamp,
                        event_type: String, value: Double)

  case class TouchState(firstTouch: String, lastTouch: String)

  case class Attribution(user_id: Long, event_id: Long,
                         first_touch: String, last_touch: String,
                         value: Double)

  private val Touches = Set("click", "view")

  def fold(userId: Long, events: Iterator[TouchEvent],
           state: GroupState[TouchState]): Iterator[Attribution] = {
    val sorted = events.toSeq.sortBy(e =>
      (Sessionize.tsToUs(e.ts), e.event_id))
    var st = state.getOption.getOrElse(TouchState(null, null))
    val out = Seq.newBuilder[Attribution]
    sorted.foreach { e =>
      if (e.event_type == "purchase") {
        out += Attribution(userId, e.event_id,
          Option(st.firstTouch).getOrElse("none"),
          Option(st.lastTouch).getOrElse("none"), e.value)
      } else if (Touches(e.event_type)) {
        st = TouchState(
          if (st.firstTouch == null) e.event_type else st.firstTouch,
          e.event_type)
      }
    }
    if (st.firstTouch != null) state.update(st)
    out.result().iterator
  }

  /** Wire the fold over a (possibly streaming) typed event Dataset. */
  def attribute(events: Dataset[TouchEvent]): Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Attribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}

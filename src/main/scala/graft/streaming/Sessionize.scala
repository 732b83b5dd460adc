package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState: gap-based user
  * sessionization over the events stream — the KeyValueGroupedDataset
  * stateful-operator surface (reference subscriptions keep per-consumer
  * cursors in Redis; Spark keeps operator state in the state store,
  * checkpointed with the query). */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, lastSeen: Long, events: Int, total: Double)
  case class SessionOut(user_id: Long, startTs: Timestamp, endTs: Timestamp,
      events: Int, total: Double)

  val GapMs: Long = 30 * 60 * 1000L

  /** Emits a session row whenever a user's event gap exceeds GapMs, and
    * flushes an idle user's trailing open session when the event-time
    * watermark passes its gap horizon (EventTimeTimeout — without it a
    * user who stops sending events never gets their last session
    * emitted). Streaming callers must set a watermark on `ts` before
    * calling; in batch runs timeouts never fire, so batch output is
    * closed sessions only.
    *
    * Memory note: each invocation sorts ONE user's events from ONE
    * micro-batch (bounded by trigger size, not by total stream volume);
    * gap detection needs intra-batch event-time order, which file/kafka
    * sources do not guarantee. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastSeen + GapMs with no new events:
            // the open session is final — emit and clear
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(st.start),
              new Timestamp(st.lastSeen), st.events, st.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(SessionState(-1L, -1L, 0, 0.0))
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st.start < 0) st = SessionState(t, t, 1, e.value)
              else if (t - st.lastSeen > GapMs) {
                out += SessionOut(userId, new Timestamp(st.start),
                  new Timestamp(st.lastSeen), st.events, st.total)
                st = SessionState(t, t, 1, e.value)
              } else st = st.copy(lastSeen = t, events = st.events + 1,
                total = st.total + e.value)
            }
            state.update(st)
            // getCurrentWatermarkMs throws in batch mode (no watermark →
            // timeouts never fire there, by design); in streaming the
            // timeout must be clamped ABOVE the current watermark — a
            // straggler group whose lastSeen+GapMs is already behind it
            // would otherwise fail to register any timeout and its
            // trailing session would leak forever
            scala.util.Try(state.getCurrentWatermarkMs()).foreach { wm =>
              state.setTimeoutTimestamp(math.max(st.lastSeen + GapMs, wm + 1))
            }
            out.iterator
          }
      }
  }
}

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
    * Memory note: gap sessions are the transitive closure of "within
    * GapMs", which is ORDER-INDEPENDENT — so instead of materializing
    * and sorting one user's batch slice (the r3 shape: a hot user in a
    * large trigger allocated their whole slice), each event folds into
    * a TreeMap of live session intervals keyed by start time. Per-event
    * work is O(log s) and peak allocation is O(sessions in the batch),
    * never O(events in the batch) — raw events are never buffered, in
    * order or not. */
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
            // live session intervals, keyed (and iterated) by start
            val sessions = new java.util.TreeMap[Long, SessionState]()
            state.getOption.foreach(st => sessions.put(st.start, st))
            rows.foreach { e =>
              val t = e.ts.getTime
              val fl = sessions.floorEntry(t)
              if (fl != null && t - fl.getValue.lastSeen <= GapMs) {
                // t lands inside or within-gap-after the preceding
                // session: absorb, then swallow any following sessions
                // the extended end now bridges
                val s0 = fl.getValue
                var m = SessionState(s0.start, math.max(s0.lastSeen, t),
                  s0.events + 1, s0.total + e.value)
                var ce = sessions.higherEntry(m.start)
                while (ce != null && ce.getValue.start - m.lastSeen <= GapMs) {
                  val c = ce.getValue
                  m = SessionState(m.start, math.max(m.lastSeen, c.lastSeen),
                    m.events + c.events, m.total + c.total)
                  sessions.remove(ce.getKey)
                  ce = sessions.higherEntry(m.start)
                }
                sessions.put(m.start, m)
              } else {
                val ce = sessions.ceilingEntry(t)
                if (ce != null && ce.getValue.start - t <= GapMs) {
                  // within gap BEFORE the next session: extend it down
                  // (its floor-gap can't close — the floor check failed)
                  val c = ce.getValue
                  sessions.remove(ce.getKey)
                  sessions.put(t, SessionState(t, c.lastSeen,
                    c.events + 1, c.total + e.value))
                } else sessions.put(t, SessionState(t, t, 1, e.value))
              }
            }
            // every interval but the last is closed by construction
            // (consecutive intervals are > GapMs apart, or they'd have
            // merged); the last stays open in state
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            val it = sessions.values().iterator()
            var st = it.next() // state or ≥1 event: never empty
            while (it.hasNext) {
              out += SessionOut(userId, new Timestamp(st.start),
                new Timestamp(st.lastSeen), st.events, st.total)
              st = it.next()
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

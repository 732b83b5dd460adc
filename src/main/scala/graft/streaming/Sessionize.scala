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

  /** Emits a session row whenever a user's event gap exceeds GapMs (or
    * state times out). Works identically on a streaming or batch-test
    * Dataset grouped per user. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
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
          out.iterator
      }
  }
}

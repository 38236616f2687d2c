package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization via
  * `flatMapGroupsWithState` with an event-time timeout (SURVEY §2.2
  * streaming row — "custom state"; the batch twin is query
  * `q29_sessionize`). A session closes when the watermark passes its last
  * event plus the gap; the closed session is emitted exactly once.
  *
  * Scale notes: state is one small record per active (user, session);
  * watermark-driven timeout bounds it. The shuffle is on the group key
  * (user_id) only.
  */
object Sessionize {
  val GapMs: Long = 30 * 60 * 1000L

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, session_value: Double)

  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n, math.rint(s.sum * 100) / 100))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= GapMs =>
                  cur = Some(s.copy(end = math.max(s.end, t), n = s.n + 1,
                    sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.end), s.n, math.rint(s.sum * 100) / 100)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + GapMs)
            }
            closed.reverseIterator
          }
      }
  }
}

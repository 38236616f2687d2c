package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, date_trunc}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization via
  * `flatMapGroupsWithState` with an event-time timeout (SURVEY §2.2
  * streaming row — "custom state"; the batch twin is query
  * `q29_sessionize`). A session closes when the watermark passes its last
  * event plus the gap; the closed session is emitted exactly once.
  *
  * Event times are SECOND-truncated on entry (and null event times
  * dropped), because that is the batch twin's arithmetic: q29 and the
  * st07/st13 oracles compare `unix_timestamp`/`date_diff('second')`
  * WHOLE SECONDS, while this state logic compares epoch instants — on the
  * corpus's microsecond-precision timestamps a gap of 1800.4 s is a new
  * session here but the same session there (r10 review; every output
  * column is already second-formatted, so truncation changes no emitted
  * value, only the boundary semantics). Truncation also makes the timeout
  * comparison integer-exact against the oracle's strict `end + gap <
  * watermark` close predicate.
  *
  * Scale notes: state is one small record per active (user, session);
  * watermark-driven timeout bounds it. The shuffle is on the group key
  * (user_id) only.
  */
object Sessionize {
  val GapMs: Long = 30 * 60 * 1000L

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sumCents: Long)
  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, session_value: Double)

  /** Per-event cents under the same HALF_UP decimal(12,2) rounding both
    * engines' `SUM(CAST(value AS DECIMAL(12,2)))` applies — the old
    * accumulate-doubles-then-rint shape rounded ONCE at the end
    * (half-to-even), so a 0.125-valued event emitted 0.12 where the
    * batch twin and oracle say 0.13 (r10 review).
    */
  private def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  private def emit(userId: Long, s: SessionState): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n,
      s.sumCents / 100.0)

  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    events.toDF()
      // the q29/ts03/ts04 convention — and a null user has no session at
      // all (the non-nullable Event encoder would otherwise ABORT the
      // whole stream on the first null-user event)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      // null VALUE keeps the event (it still shapes the session's gaps and
      // counts) and contributes 0 to session_value — the st07/st13/oracle
      // agreement. Without this the non-nullable Event encoder aborted the
      // whole query on the first null-value event while the oracle kept
      // the row (r14 review; fixture-dormant, same class as the st10
      // null-user guard)
      .withColumn("value",
        org.apache.spark.sql.functions.coalesce(col("value"),
          org.apache.spark.sql.functions.lit(0.0)))
      .withColumn("ts", date_trunc("second", col("ts")))
      .as(Encoders.product[Event])
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(emit(userId, s))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              val c = cents(e.value)
              cur match {
                case Some(s) if t > s.end + GapMs =>
                  closed ::= emit(userId, s)
                  cur = Some(SessionState(t, t, 1, c))
                case Some(s) if t < s.start - GapMs =>
                  // a late event more than the gap BEFORE the session: in
                  // the batch sort it is its own earlier, already-ended
                  // session — emit it closed, leave the live session
                  // alone. (Unreachable while watermark delay < gap: an
                  // admitted event is at most 10 min behind this user's
                  // end; kept as the defined fallback rather than the old
                  // behavior of absorbing it into a session it predates.)
                  closed ::= Session(userId, e.ts, e.ts, 1, c / 100.0)
                case Some(s) =>
                  // within the gap of the session's span on either side:
                  // a late-but-admitted event may EXTEND the start
                  // backward, exactly as the batch sort would have
                  cur = Some(s.copy(start = math.min(s.start, t),
                    end = math.max(s.end, t), n = s.n + 1,
                    sumCents = s.sumCents + c))
                case None =>
                  cur = Some(SessionState(t, t, 1, c))
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

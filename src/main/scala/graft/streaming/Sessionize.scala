package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, date_trunc}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization via
  * `flatMapGroupsWithState` with an event-time timeout (SURVEY §2.2
  * streaming row — "custom state"; the batch twin is query
  * `q29_sessionize`). A session is emitted exactly once, when the
  * watermark STRICTLY passes its last event plus the gap — the one
  * emission rule that is sound under admissible lateness: an event the
  * watermark still admits (ts > watermark) can never extend or bridge a
  * session whose end + gap < watermark. The pre-r15 design also closed a
  * session the moment a gap-splitting SUCCESSOR event arrived
  * (watermark-independent prompt emission); that is provably unsound —
  * with watermark delay (10 min) < gap (30 min), a successor landing
  * 30–40 min after the predecessor's end leaves a window where a
  * late-but-admitted event bridges the two, and the stream had already
  * emitted the predecessor: two sessions where the batch sort computes
  * one (r15 review). State is therefore a small LIST of open sessions
  * per user; an admitted event merges into every session within the gap
  * of its span (possibly welding two open sessions), exactly the batch
  * transitive rule.
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

  /** Per-user state: every session the watermark has not yet closed.
    * Bounded small: a session leaves the list as soon as the watermark
    * passes end + gap, and with watermark delay < gap at most a couple of
    * sessions per user are ever simultaneously open-or-unclosed.
    */
  case class SessionsState(sessions: Seq[SessionState])
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

  /** Merge one admitted event into the open-session list: every session
    * within the gap of the event (on either side) welds with it — and
    * with EACH OTHER, the batch sort's transitive rule — into one
    * session; the rest pass through. The list is kept ASCENDING BY `end`
    * (welding removes a contiguous-in-end run and re-inserts one merged
    * session in order), so the close sweep below can stop at the first
    * still-open session instead of scanning the whole list — the r15
    * sweep-cost note.
    */
  private[streaming] def insert(list: Seq[SessionState], t: Long, c: Long)
      : Seq[SessionState] = {
    val (near, far) = list.partition(s =>
      t >= s.start - GapMs && t <= s.end + GapMs)
    val welded = near.foldLeft(SessionState(t, t, 1, c))((a, s) =>
      SessionState(math.min(a.start, s.start), math.max(a.end, s.end),
        a.n + s.n, a.sumCents + s.sumCents))
    val (before, after) = far.span(_.end < welded.end)
    (before :+ welded) ++ after
  }

  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    implicit val sessEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionsState]
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
      .flatMapGroupsWithState[SessionsState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[SessionsState]) =>
          // ONE body for data batches and timeout firings (rows is empty
          // on timeout): fold admitted events into the open-session list,
          // then sweep — emit every session the watermark has strictly
          // closed, keep the rest with the earliest remaining close as
          // the next timeout. Emission is ONLY here, never on successor
          // arrival (see the object scaladoc: prompt emission splits
          // sessions a late-but-admitted bridge event would weld).
          val open0 = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val open = rows.toSeq.sortBy(_.ts.getTime).foldLeft(open0) {
            (list, e) => insert(list, e.ts.getTime, cents(e.value))
          }
          val wm = state.getCurrentWatermarkMs()
          // strict closure (end + gap < watermark) — the boundary-equal
          // session stays open, matching the oracle's close predicate and
          // the event-time-timeout spec's pinned semantics. `span`, not
          // `partition`: the list is end-ascending (insert's invariant),
          // so closable sessions are exactly a prefix and the sweep
          // early-exits at the first survivor.
          val (closed, stillOpen) = open.span(_.end + GapMs < wm)
          if (stillOpen.nonEmpty) {
            state.update(SessionsState(stillOpen))
            // a timeout must sit strictly past the current watermark;
            // head is the min-end survivor (end-ascending invariant)
            state.setTimeoutTimestamp(
              math.max(stillOpen.head.end + GapMs, wm + 1))
          } else state.remove()
          closed.sortBy(_.start).iterator.map(emit(userId, _))
      }
  }
}

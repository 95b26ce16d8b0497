package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming twins of the batch event analytics (SURVEY §2.7 ST2/
  * ST3 extensions): inactivity-gap sessionization via
  * `flatMapGroupsWithState`, and watermark-bounded streaming dedup via
  * `dropDuplicatesWithinWatermark`.
  *
  * The batch `EventQueries.sessions` computes sessions with a lag→flag→
  * running-sum window over the full history; a stream cannot see the full
  * history, so the streaming formulation keeps ONE open session per user in
  * managed state and emits a session row when it closes — either because a
  * later event arrives past the gap, or because the event-time watermark
  * passes the open session's gap horizon (timeout). Emitted rows carry the
  * same columns as the batch query (user_id, session_start_us, n_events,
  * session_value_cents), so closed streamed sessions are directly
  * comparable to the batch result — the StreamingSessionSpec assertion.
  *
  * Scale shape: state is one small fixed-size record per ACTIVE user (not
  * per event), keyed state is hash-partitioned across executors, and the
  * event-time timeout bounds state lifetime to gap + watermark horizon —
  * no unbounded growth, no driver-side state. At 100 TB of events the
  * stateful shuffle carries only (user_id → 32-byte state) traffic.
  */
object StreamingSessions {

  /** One event inside a user's stream. ts_us is integer event-time µs (the
    * engine-portable representation — see Tables.eventsUs); value_cents is
    * the exact-money form of `value` (ExprUtils.cents). */
  case class SessionEvent(user_id: Long, ts_us: Long, event_id: Long,
                          value_cents: Long)

  /** The open session for one user. */
  case class OpenSession(session_start_us: Long, last_ts_us: Long,
                         n_events: Long, value_cents: Long)

  /** Per-user managed state: the open session (if any) plus the number of
    * sessions already closed — the streaming carrier of the batch query's
    * per-user `session_seq`. The counter means a small record stays alive
    * per ever-seen user even after their session closes (the price of
    * batch-parity numbering); a production TTL eviction would trade seq
    * continuity for strictly bounded state. */
  case class UserSessions(nextSeq: Long, open: Option[OpenSession])

  /** A closed session — schema matches the batch EventQueries.sessions
    * output, INCLUDING session_seq (0-based per user, in session-start
    * order — sessions close chronologically per user, so the running
    * counter reproduces the batch window numbering; a session dropped
    * entirely by the watermark would shift later seqs, the same caveat as
    * any late-data drop). */
  case class ClosedSession(user_id: Long, session_start_us: Long,
                           n_events: Long, session_value_cents: Long,
                           session_seq: Long)

  val DefaultGapUs: Long = 1800L * 1000000L // 30 min, same as batch

  /** Fold a sorted run of events into the open-session state, emitting
    * sessions that close mid-batch numbered from `startSeq`. Returns
    * (closed, still-open, next seq). Pure function — unit-testable
    * without a streaming query. */
  private[graft] def advance(user: Long, events: Array[SessionEvent],
                             start: Option[OpenSession], gapUs: Long,
                             startSeq: Long = 0L)
      : (Seq[ClosedSession], Option[OpenSession], Long) = {
    var open = start
    var seq = startSeq
    val closed = Seq.newBuilder[ClosedSession]
    events.foreach { e =>
      open = open match {
        case Some(st) if e.ts_us - st.last_ts_us > gapUs =>
          closed += ClosedSession(user, st.session_start_us, st.n_events,
            st.value_cents, seq)
          seq += 1
          Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value_cents))
        case Some(st) =>
          Some(OpenSession(st.session_start_us,
            math.max(st.last_ts_us, e.ts_us),
            st.n_events + 1L, st.value_cents + e.value_cents))
        case None =>
          Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value_cents))
      }
    }
    (closed.result(), open, seq)
  }

  /** Sessionize a streaming events table (schema of Tables.events — must
    * carry `ts` TimestampType, `user_id`, `event_id`, `value`).
    *
    * Late events beyond `watermark` are dropped by the engine; an open
    * session closes via timeout once the watermark passes its last event +
    * gap. Events within a micro-batch are sorted by (ts_us, event_id)
    * before folding, so intra-batch disorder is absorbed exactly like the
    * batch window's ORDER BY. */
  def sessionize(events: DataFrame, gapUs: Long = DefaultGapUs,
                 watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long").as("event_id"),
        graft.functions.ExprUtils.cents(col("value")).as("value_cents"),
        col("ts"))
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[UserSessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[UserSessions]) =>
          if (state.hasTimedOut) {
            val st = state.get
            st.open match {
              case Some(o) =>
                // keep the counter (session_seq continuity), clear the open
                state.update(UserSessions(st.nextSeq + 1, None))
                Iterator.single(ClosedSession(user, o.session_start_us,
                  o.n_events, o.value_cents, st.nextSeq))
              case None => Iterator.empty
            }
          } else {
            val evs = it
              .map(t => SessionEvent(t._1, t._2, t._3, t._4))
              .toArray.sortBy(e => (e.ts_us, e.event_id))
            val st0 = state.getOption.getOrElse(UserSessions(0L, None))
            val (closed, open, seq) =
              advance(user, evs, st0.open, gapUs, st0.nextSeq)
            open match {
              case Some(st) =>
                // Timeout fires when the watermark passes last event + gap
                // (timeout timestamps are event-time MILLIS). If the
                // watermark is ALREADY past the horizon (this batch carried
                // only old events for this user), setTimeoutTimestamp would
                // throw — the session is closed; emit it now.
                val timeoutMs = st.last_ts_us / 1000L + gapUs / 1000L
                if (state.getCurrentWatermarkMs() >= timeoutMs) {
                  state.update(UserSessions(seq + 1, None))
                  (closed :+ ClosedSession(user, st.session_start_us,
                    st.n_events, st.value_cents, seq)).iterator
                } else {
                  state.update(UserSessions(seq, Some(st)))
                  state.setTimeoutTimestamp(timeoutMs)
                  closed.iterator
                }
              case None =>
                // no open session: store the counter only if it carries
                // information (some session has ever closed)
                if (seq > 0L || state.exists) state.update(UserSessions(seq, None))
                closed.iterator
            }
          }
      }
  }

  /** ST2 watermark-bounded streaming dedup: drop rows whose `keyCols`
    * repeat within the watermark horizon. Unlike plain `dropDuplicates`
    * (whose key state grows forever), state here is evicted once the
    * watermark passes — the engine-native way to run exact dedup on an
    * unbounded stream when duplicates arrive close together (the
    * replayed-file / at-least-once-source case, README.md:56 analog). */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           eventTimeCol: String = "ts",
                           watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}

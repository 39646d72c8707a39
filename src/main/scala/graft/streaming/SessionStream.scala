package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{functions => F}

/** Streaming gap-based sessionization — the online half of
  * [[graft.pipeline.Sessionize]], built on
  * `flatMapGroupsWithState` (the custom-state API; the batch operator's
  * lag-window formulation has no streaming equivalent because a window
  * over an unbounded stream never closes).
  *
  * State per user is ONE open session (a few fixed-size fields + a
  * bounded distinct-event-type set) — KB-bounded regardless of stream
  * length; a closed session is emitted the moment a gap larger than
  * `gapSeconds` arrives, and an idle user's final session is flushed by
  * the event-time timeout once the watermark passes its gap horizon.
  * Output rows match the batch operator's per-session schema
  * (`n_event_types` capped at `maxEventTypes` — a profiling count, not
  * an unbounded set).
  *
  * Scale shape: `groupByKey(user)` is the same single user-keyed
  * exchange as the batch plan; a timed-out user's session state shrinks
  * to a zero-event sentinel holding only its last session_seq (so
  * numbering survives the flush), hence state is O(distinct users ever
  * seen) at a few dozen bytes each — not O(events). For user universes
  * where even that is too much, `sequenceTtlSeconds` expires idle
  * sentinels (state O(users active within the TTL), numbering restarts
  * for users idle longer than the TTL) and `retainSequence = false`
  * drops them immediately (state O(active users)).
  */
object SessionStream {

  /** `ts` rides along untouched: it is the watermark-tagged attribute,
    * and the event-time-timeout checker requires it to survive into the
    * stateful operator's input (a typed map would re-serialize it into a
    * fresh, untagged attribute). */
  case class Event(
      user_id: Long, ts: java.sql.Timestamp, ts_us: Long, event_id: Long,
      has_value: Boolean, event_type: String)

  case class OpenSession(
      sessionSeq: Long, startUs: Long, lastUs: Long, nEvents: Long,
      nValues: Long, eventTypes: Set[String])

  case class Session(
      user_id: Long, session_seq: Long, n_events: Long, start_us: Long,
      end_us: Long, n_event_types: Long, n_values: Long,
      duration_secs: Long)

  /** Saturating add: a huge `sequenceTtlSeconds` must behave as
    * retain-nearly-forever, not overflow negative and (via the watermark
    * clamp) silently expire next batch. */
  private def satAdd(a: Long, b: Long): Long =
    try math.addExact(a, b)
    catch { case _: ArithmeticException => Long.MaxValue }

  private def toSession(user: Long, s: OpenSession): Session =
    Session(user, s.sessionSeq, s.nEvents, s.startUs, s.lastUs,
      s.eventTypes.size.toLong, s.nValues, (s.lastUs - s.startUs) / 1000000L)

  /** One user's micro-batch: fold the (time-ordered) new events into the
    * open session, emitting every session closed by a gap. On timeout,
    * flush the open session. */
  private def updateUser(gapUs: Long, maxEventTypes: Int,
      retainSequence: Boolean, sequenceTtlUs: Option[Long])(
      user: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // A zero-event sentinel timing out means the sequence TTL expired
      // with no new events: drop the user's state entirely. If the user
      // returns later, numbering restarts at 1 — the documented trade
      // that bounds state to O(users active within the TTL) instead of
      // O(users ever seen).
      if (state.getOption.exists(_.nEvents == 0L)) {
        state.remove()
        return Iterator.empty
      }
      // Flush the idle user's open session but (by default) KEEP the
      // sequence counter as a zero-event sentinel, so the user's next
      // session continues the batch operator's 1..N numbering instead of
      // restarting at 1 (which would emit duplicate
      // (user_id, session_seq) keys in append output). The sentinel is a
      // few dozen bytes per ever-seen user; with `sequenceTtlUs` set its
      // timer is re-armed to the TTL horizon so the sentinel itself
      // expires once the watermark passes lastEmit + ttl (see above) —
      // otherwise the timer is pushed effectively to infinity and the
      // sentinel lives forever (and if it somehow fired, the nEvents
      // guard above removes it without emitting). With
      // retainSequence = false state drops to zero for idle users and
      // numbering restarts per flush — the documented trade for corpora
      // whose user universe dwarfs the state store.
      val flushed = state.getOption.filter(_.nEvents > 0L)
      flushed.foreach { s =>
        if (retainSequence) {
          state.update(OpenSession(s.sessionSeq, 0L, 0L, 0L, 0L, Set.empty))
          state.setTimeoutTimestamp(sequenceTtlUs match {
            // clamped: setTimeoutTimestamp rejects timestamps at or
            // behind the watermark, and for a user idle much longer
            // than the TTL the horizon is already behind it — expire at
            // the very next batch instead
            case Some(ttl) => math.max(
              satAdd(satAdd(s.lastUs, gapUs), ttl) / 1000L + 1L,
              state.getCurrentWatermarkMs() + 1L)
            case None      => Long.MaxValue / 2
          })
        } else state.remove()
      }
      return flushed.map(toSession(user, _)).iterator
    }
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open = open match {
        // resumed after a timeout flush: the sentinel carries only the
        // last emitted sequence — continue numbering from it (this case
        // must precede the gap checks or lastUs=0 would "close" it)
        case Some(s) if s.nEvents == 0L =>
          Some(OpenSession(s.sessionSeq + 1, e.ts_us, e.ts_us, 1L,
            if (e.has_value) 1L else 0L, Set(e.event_type)))
        case Some(s) if e.ts_us - s.lastUs <= gapUs =>
          Some(s.copy(lastUs = math.max(s.lastUs, e.ts_us),
            nEvents = s.nEvents + 1,
            nValues = s.nValues + (if (e.has_value) 1L else 0L),
            eventTypes =
              if (s.eventTypes.size >= maxEventTypes) s.eventTypes
              else s.eventTypes + e.event_type))
        case Some(s) =>
          closed += toSession(user, s)
          Some(OpenSession(s.sessionSeq + 1, e.ts_us, e.ts_us, 1L,
            if (e.has_value) 1L else 0L, Set(e.event_type)))
        case None =>
          Some(OpenSession(1L, e.ts_us, e.ts_us, 1L,
            if (e.has_value) 1L else 0L, Set(e.event_type)))
      }
    }
    open.foreach { s =>
      state.update(s)
      // flush once the watermark passes the open session's gap horizon
      // (a sentinel can only reach here on a data-less invocation, which
      // the API never makes — but never arm its stale lastUs=0 timer)
      if (s.nEvents > 0L)
        state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L + 1L)
    }
    closed.result().iterator
  }

  /** Sessionize a streaming frame with columns
    * (user_id, ts, event_id, value, event_type). `watermarkDelay` bounds
    * how late an event may arrive and still join its session; the
    * output is append-mode (each session emitted exactly once).
    * `retainSequence` (default true) keeps a tiny per-user sentinel after
    * a timeout flush so session_seq continues 1..N across idle gaps —
    * state O(distinct users ever seen); pass false to drop idle users
    * entirely (numbering restarts per flush, state O(active users)).
    * `sequenceTtlSeconds` is the middle ground for web-scale user
    * universes: the sentinel expires once the watermark passes
    * `last event + gap + ttl`, so state is O(users active within the
    * TTL) and only a user idle LONGER than the TTL restarts numbering
    * at 1 (duplicate (user_id, session_seq) keys become possible for
    * such users — downstream keys should include start_us if that
    * matters). None (the default) retains sentinels forever, which is
    * fine up to ~10^8 users (a few GB of state store) but wants a TTL
    * beyond that. */
  def sessions(
      stream: DataFrame, gapSeconds: Long,
      watermarkDelay: String = "1 hour",
      maxEventTypes: Int = 1000,
      retainSequence: Boolean = true,
      sequenceTtlSeconds: Option[Long] = None): Dataset[Session] = {
    require(sequenceTtlSeconds.forall(_ > 0L),
      s"sequenceTtlSeconds must be positive, got $sequenceTtlSeconds")
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .filter(F.col("user_id").isNotNull && F.col("ts").isNotNull &&
        F.col("event_id").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(F.col("user_id"), F.col("ts"),
        F.unix_micros(F.col("ts")).as("ts_us"), F.col("event_id"),
        F.col("value").isNotNull.as("has_value"), F.col("event_type"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateUser(gapSeconds * 1000000L, maxEventTypes, retainSequence,
          // saturating: a TTL past ~292k years means retain-nearly-forever
          sequenceTtlSeconds.map(t =>
            try math.multiplyExact(t, 1000000L)
            catch { case _: ArithmeticException => Long.MaxValue })))
  }
}

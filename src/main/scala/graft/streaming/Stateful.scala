package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

import java.sql.Timestamp
import scala.collection.mutable

/** One input event for stateful sessionization. */
case class UserEvent(user_id: Long, ts: Timestamp)

/** Per-user open-session state kept in the state store (millis epoch — the
  * state store favors compact primitives over Timestamp objects).
  */
case class OpenSession(startMs: Long, endMs: Long, n: Long)

/** An emitted (closed) session. */
case class ClosedSession(user_id: Long, session_start: Timestamp,
                         session_end: Timestamp, n_events: Long)

/** One input event for streaming attribution (integer micros — exact). */
case class AttrEvent(user_id: Long, event_id: Long, us: Long,
                     event_type: String, value: Double)

/** Per-user attribution state: the last non-purchase touch seen. */
case class LastTouch(touch: String)

/** An attributed purchase emitted by [[Stateful.streamAttribution]]. */
case class AttributedPurchase(user_id: Long, attributed: String,
                              value: Double)

/** One hour-bucketed event for [[Stateful.streamEwmaBurst]]. */
case class TypedHourEvent(event_type: String, hb: Long)

/** Per-type EWMA state: last processed hour bucket + the running
  * integer EWMA (post-update).
  */
case class EwmaState(lastHb: Long, ewma: Long)

/** One scored hour: `prev` is the PRE-update ewma (-1 on the seed row),
  * `burst` flags x > 2·prev.
  */
case class HourEwma(event_type: String, hb: Long, x: Long, prev: Long,
                    burst: Boolean)

/** Custom-state streaming operators — the part of the extension surface
  * that `session_window` can't express: arbitrary per-key state machines
  * via `flatMapGroupsWithState` with event-time timeouts.
  *
  * Scale notes: state is one `OpenSession` per active user (bytes, not
  * events — events are folded in on arrival and discarded); the watermark
  * drives timeouts, so closed sessions leave the store and state size is
  * bounded by concurrently-active users. Input is hash-partitioned by key
  * by the groupByKey shuffle; 1000 executors each hold 1/1000 of the
  * users' state in their local store.
  */
object Stateful {

  /** Gap-based sessionization as an explicit per-user state machine.
    *
    * Semantics match [[Sessionize.sessionStream]] (same gap rule: an event
    * within `gapMs` of the open session's end extends it; session_end is
    * last-event + gap, like `session_window`), but implemented with
    * `flatMapGroupsWithState` + `EventTimeTimeout`: sessions are emitted
    * either when a later event of the same user arrives beyond the gap, or
    * when the watermark (event time − `lateness`) passes the open
    * session's end and the timeout fires.
    */
  def statefulSessions(events: Dataset[UserEvent], gapMs: Long,
                       lateness: String): Dataset[ClosedSession] = {
    val s = events.sparkSession
    import s.implicits._

    def close(userId: Long, st: OpenSession): ClosedSession =
      ClosedSession(userId, new Timestamp(st.startMs),
        new Timestamp(st.endMs + gapMs), st.n)

    def fn(userId: Long, batch: Iterator[UserEvent],
           state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      val out = mutable.ArrayBuffer.empty[ClosedSession]
      if (state.hasTimedOut) {
        out += close(userId, state.get)
        state.remove()
      } else {
        // Fold this micro-batch's events (sorted by event time) into the
        // open session, closing and emitting whenever the gap is exceeded.
        var cur = state.getOption.orNull
        batch.map(_.ts.getTime).toArray.sorted.foreach { t =>
          cur =
            if (cur == null) OpenSession(t, t, 1)
            else if (t <= cur.endMs + gapMs)
              OpenSession(cur.startMs, math.max(cur.endMs, t), cur.n + 1)
            else { out += close(userId, cur); OpenSession(t, t, 1) }
        }
        if (cur != null) {
          state.update(cur)
          // Fire once the watermark passes the session's gap horizon.
          state.setTimeoutTimestamp(cur.endMs + gapMs)
        }
      }
      out.iterator
    }

    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming last-touch attribution as a per-user state machine: the
    * state is ONE string (the user's most recent non-purchase event type);
    * each purchase is emitted immediately, credited to that touch — the
    * realtime mirror of the batch q_attribution gate, checked against the
    * SAME oracle.
    *
    * Within a micro-batch the group's events are sorted by (us, event_id)
    * before the walk — `flatMapGroupsWithState` hands the iterator in
    * arrival order, not event-time order — and the carried state makes
    * the walk correct ACROSS batches as long as batches arrive in event-
    * time order (true for AvailableNow over an ordered log; an
    * out-of-order multi-batch feed would need event-time buffering +
    * timeouts like [[statefulSessions]]). State size: one short string
    * per user ever seen — bytes per key, no event retention.
    */
  def streamAttribution(events: Dataset[AttrEvent])
  : Dataset[AttributedPurchase] = {
    val s = events.sparkSession
    import s.implicits._

    def fn(userId: Long, batch: Iterator[AttrEvent],
           state: GroupState[LastTouch]): Iterator[AttributedPurchase] = {
      val out = mutable.ArrayBuffer.empty[AttributedPurchase]
      var last = state.getOption.map(_.touch).orNull
      batch.toArray.sortBy(e => (e.us, e.event_id)).foreach { e =>
        if (e.event_type == "purchase")
          out += AttributedPurchase(userId,
            if (last == null) "none" else last, e.value)
        else last = e.event_type
      }
      if (last != null) state.update(LastTouch(last))
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Watermarked tumbling-window count per (window, event_type) — the
    * canonical streaming aggregation: late data beyond `lateness` is
    * dropped, closed windows are emitted once (append mode).
    */
  def windowedTypeCounts(events: DataFrame, windowLen: String,
                         lateness: String): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Streaming EWMA burst detector — an ordered per-key integer
    * recursion in state, the stateful shape neither windowed aggs nor
    * dropDuplicates can express: per event_type the detector walks
    * hourly buckets in event-time order carrying
    * `ewma' = (x + 3·ewma) div 4` (exact integer arithmetic — the
    * truncating div is part of the statistic, so engine and oracle are
    * bit-equal with no FP anywhere) and flags hours whose count exceeds
    * twice the PRE-update ewma. State per key is a single (hb, ewma)
    * pair — bytes, not history; the hour map built per micro-batch is
    * bounded by calendar hours, not event volume. Batch events are
    * bucket-counted then walked sorted, so within a micro-batch order
    * is deterministic; across micro-batches the state's own `lastHb`
    * frontier enforces order — any bucket at or behind it is dropped
    * rather than allowed to corrupt the recursion (see the guard in
    * the walk below). Because that discard is the documented delivery
    * precondition's failure mode (an hour split across micro-batches
    * loses its second partial), it is NOT silent: every dropped bucket
    * increments `droppedBuckets` (caller-supplied, or a fresh named
    * accumulator visible in the UI/metrics), so multi-batch callers
    * can detect undercounted EWMAs instead of trusting them blindly.
    *
    * @param droppedBuckets accumulator incremented once per discarded
    *                       (event_type, hour) bucket. AT-LEAST-ONCE:
    *                       task retries and speculative execution can
    *                       replay a partition's drops, so a nonzero
    *                       value means "drops happened", not an exact
    *                       count — treat it as a red flag, not a metric
    *                       to reconcile. Pass your own to observe it,
    *                       or let the shared default surface the count
    *                       in Spark metrics (one accumulator per
    *                       SparkContext — ADVICE r11 #5 — so repeated
    *                       calls don't pile up same-named
    *                       registrations).
    */
  def streamEwmaBurst(
      events: Dataset[TypedHourEvent],
      droppedBuckets: Option[org.apache.spark.util.LongAccumulator] = None)
  : Dataset[HourEwma] = {
    val s = events.sparkSession
    import s.implicits._
    val dropAcc = droppedBuckets.getOrElse(
      Stateful.defaultDropAcc.computeIfAbsent(s.sparkContext,
        sc => sc.longAccumulator(
          "graft.streamEwmaBurst.droppedBuckets")))

    def fn(et: String, batch: Iterator[TypedHourEvent],
           state: GroupState[EwmaState]): Iterator[HourEwma] = {
      val counts = mutable.HashMap.empty[Long, Long]
      batch.foreach(e =>
        counts.update(e.hb, counts.getOrElse(e.hb, 0L) + 1L))
      val out = mutable.ArrayBuffer.empty[HourEwma]
      var st = state.getOption.orNull
      counts.keysIterator.toArray.sorted.foreach { hb =>
        val x = counts(hb)
        if (st == null) {
          out += HourEwma(et, hb, x, -1L, burst = false)
          st = EwmaState(hb, x)
        } else if (hb <= st.lastHb) {
          // The recursion only advances forward: an hour bucket at or
          // behind the state frontier means either late/out-of-order
          // arrival across micro-batches or the same hour split across
          // two batches (possible under AvailableNow with
          // maxFilesPerTrigger). Processing it would corrupt the EWMA
          // with a partial count and double-emit the hour in Append
          // mode, so it is DROPPED — the stateful analogue of a
          // watermark discard — and COUNTED into the accumulator so
          // the discard is observable. Callers that need every hour
          // counted must deliver one batch per hour frontier (the
          // gate's single-trigger AvailableNow run satisfies this).
          dropAcc.add(1L)
        } else {
          val burst = x > 2L * st.ewma
          out += HourEwma(et, hb, x, st.ewma, burst)
          st = EwmaState(hb, (x + 3L * st.ewma) / 4L)
        }
      }
      if (st != null) state.update(st)
      out.iterator
    }

    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** The default `droppedBuckets` accumulator, ONE per SparkContext: a
    * fresh named accumulator per [[streamEwmaBurst]] call would pile up
    * same-named registrations in the context (ADVICE r11 #5).
    *
    * Being shared, its value is CUMULATIVE across every streamEwmaBurst
    * query on the context (ADVICE r12 — on top of the usual at-least-
    * once caveat): a reader that wants one query's own drop count must
    * pass a private accumulator. Keys are weak (MapMaker-style via
    * WeakHashMap) so a stopped SparkContext is not retained for the JVM
    * lifetime; access is synchronized because WeakHashMap is not
    * thread-safe.
    */
  private val defaultDropAcc = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext,
      org.apache.spark.util.LongAccumulator]())
}

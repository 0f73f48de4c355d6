package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** One input event for [[Tws.userTypeStats]]. */
case class UserTypedEvent(user_id: Long, event_type: String)

/** One per-user profile snapshot: distinct event types and total events
  * seen SO FAR (monotone — see [[UserTypeStatsProcessor]]).
  */
case class UserTypeStats(user_id: Long, n_types: Long, n_events: Long)

/** Per-user event-type profile on `transformWithState` — Spark 4's
  * arbitrary-state v2 API (the successor to `flatMapGroupsWithState`):
  * state is DECLARED as named, individually-addressable primitives
  * instead of one opaque case class, so the engine can store, TTL, and
  * evolve each independently in the state store. This processor
  * exercises two of the three state kinds:
  *
  *   - `ValueState[Long]` — the user's running event total;
  *   - `MapState[String, Long]` — per-event-type counts, updated
  *     point-wise (at 100 TB the map updates touch ONLY the keys seen in
  *     the batch, not the whole map — the reason MapState exists vs a
  *     Map inside a ValueState).
  *
  * The v2 API only runs on the RocksDB state store provider (state lives
  * on local disk, not executor heap), which is exactly the production
  * posture the q_stream_rocksdb_sessions twin gates.
  *
  * STATE TTL (r11 verdict #4): both state variables are declared with
  * the caller's `ttl` (default [[Tws.DefaultStateTtl]]) — the production
  * state-size control: a user idle past the TTL has their profile
  * EVICTED instead of pinned in the store forever. Spark only supports
  * state TTL in processing TimeMode ([[Tws]] wrappers pick the mode from
  * the ttl), and eviction is processing-time-relative, so inside one run
  * whose wall time is far below the TTL the semantics are bit-identical
  * to the untimed spelling (spec-pinned). `ttl = None` opts out for
  * bounded-replay/backfill jobs (TimeMode.None, AvailableNow-terminable).
  *
  * Emission is a MONOTONE snapshot per (user, batch): both counters only
  * grow within a state lifetime, so a downstream `max()` per user yields
  * the final profile regardless of how the input splits into
  * micro-batches — the batch-split-proof emission contract.
  */
class UserTypeStatsProcessor(ttl: Option[java.time.Duration])
    extends StatefulProcessor[Long, UserTypedEvent, UserTypeStats] {

  @transient private var total: ValueState[Long] = _
  @transient private var types: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    total = getHandle.getValueState[Long]("total",
      Encoders.scalaLong, Tws.ttlConfig(ttl))
    types = getHandle.getMapState[String, Long]("types",
      Encoders.STRING, Encoders.scalaLong, Tws.ttlConfig(ttl))
  }

  override def handleInputRows(key: Long, rows: Iterator[UserTypedEvent],
                               timers: TimerValues)
  : Iterator[UserTypeStats] = {
    var t = if (total.exists()) total.get() else 0L
    rows.foreach { e =>
      t += 1L
      val c =
        if (types.containsKey(e.event_type)) types.getValue(e.event_type)
        else 0L
      types.updateValue(e.event_type, c + 1L)
    }
    total.update(t)
    Iterator.single(UserTypeStats(key, types.keys().size.toLong, t))
  }
}

/** Gap sessionization on the v2 API with EVENT-TIME TIMERS — the timer
  * half of transformWithState ([[UserTypeStatsProcessor]] covers the
  * state-primitive half). Semantics are exactly
  * [[Stateful.statefulSessions]]: an event within `gapMs` of the open
  * session's end extends it, a later event closes and emits it, and the
  * last open session emits only when the watermark STRICTLY passes its
  * end+gap — here via `registerTimer` / `handleExpiredTimer` instead of
  * `GroupStateTimeout.EventTimeTimeout`. Stale timers are deleted
  * whenever a batch extends the session (one live timer per key), and
  * expiry re-checks the strict-pass rule against the current watermark —
  * re-arming at +1 ms if the watermark has only REACHED the horizon —
  * so the v1 (fMGWS), v2 (TWS), and relational-oracle emission rules are
  * bit-identical.
  *
  * NO STATE TTL here, by API constraint, not omission: Spark rejects a
  * non-NONE TTLConfig outside processing TimeMode
  * (`StateStoreErrors.cannotProvideTTLConfigForTimeMode` — spec-pinned
  * in TwsTtlSpec), and this processor is event-time by definition. The
  * state-size control in event TimeMode is the TIMER LIFECYCLE itself:
  * every key's state is cleared when its session closes (a later event
  * arrives, or the gap timer fires one tick past the watermark horizon),
  * so no key outlives its gap horizon + watermark lateness — the
  * event-time analogue of a TTL, driven by the same store machinery.
  */
class TimerSessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, UserEvent, ClosedSession] {

  @transient private var open: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    open = getHandle.getValueState[OpenSession]("open",
      Encoders.product[OpenSession], TTLConfig.NONE)
  }

  private def close(userId: Long, st: OpenSession): ClosedSession =
    ClosedSession(userId, new java.sql.Timestamp(st.startMs),
      new java.sql.Timestamp(st.endMs + gapMs), st.n)

  override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                               timers: TimerValues)
  : Iterator[ClosedSession] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var cur = if (open.exists()) open.get() else null
    rows.map(_.ts.getTime).toArray.sorted.foreach { t =>
      cur =
        if (cur == null) OpenSession(t, t, 1)
        else if (t <= cur.endMs + gapMs)
          OpenSession(cur.startMs, math.max(cur.endMs, t), cur.n + 1)
        else { out += close(key, cur); OpenSession(t, t, 1) }
    }
    if (cur != null) {
      open.update(cur)
      // one live timer per key: drop whatever horizon a previous batch
      // armed, arm the current session's gap horizon
      getHandle.listTimers().foreach(e =>
        getHandle.deleteTimer(e.asInstanceOf[Long]))
      getHandle.registerTimer(cur.endMs + gapMs)
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
                                  expired: ExpiredTimerInfo)
  : Iterator[ClosedSession] = {
    if (!open.exists()) Iterator.empty
    else {
      val st = open.get()
      val horizon = st.endMs + gapMs
      if (timers.getCurrentWatermarkInMs > horizon) {
        open.clear()
        Iterator.single(close(key, st))
      } else {
        // watermark only REACHED the horizon (fMGWS and the oracle both
        // require a STRICT pass) — re-arm one tick later
        getHandle.registerTimer(horizon + 1)
        Iterator.empty
      }
    }
  }
}

/** One min-k snapshot: the user's event count so far and the exact sum
  * of their k smallest cent-quantized values so far.
  */
case class MinKStats(user_id: Long, n_seen: Long, mink_sum: Long)

/** Bounded-list state — the third v2 primitive ([[UserTypeStatsProcessor]]
  * covers ValueState/MapState, [[TimerSessionProcessor]] timers):
  * `ListState[Long]` holds each user's k SMALLEST cent-quantized values.
  * Min-k is a lattice (more data only improves the set), so snapshots
  * are final-batch-dominant: the row with the max n_seen per user IS the
  * global answer no matter how the input splits into micro-batches. The
  * list is rewritten bounded (≤ k elements) each batch — state is O(k)
  * per user forever, the property ListState's whole-list put() makes
  * cheap. Both state variables carry the caller's `ttl` (default
  * [[Tws.DefaultStateTtl]]) — see [[UserTypeStatsProcessor]] for the
  * TTL/TimeMode contract.
  */
class MinKProcessor(k: Int, ttl: Option[java.time.Duration])
    extends StatefulProcessor[Long, ValuedEvent, MinKStats] {

  @transient private var seen: ValueState[Long] = _
  @transient private var mins: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seen = getHandle.getValueState[Long]("seen",
      Encoders.scalaLong, Tws.ttlConfig(ttl))
    mins = getHandle.getListState[Long]("mins",
      Encoders.scalaLong, Tws.ttlConfig(ttl))
  }

  override def handleInputRows(key: Long, rows: Iterator[ValuedEvent],
                               timers: TimerValues): Iterator[MinKStats] = {
    val batch = rows.map(_.vq).toArray
    val prev = if (mins.exists()) mins.get().toArray else Array.empty[Long]
    val best = (prev ++ batch).sorted.take(k)
    mins.put(best)
    val n = (if (seen.exists()) seen.get() else 0L) + batch.length
    seen.update(n)
    Iterator.single(MinKStats(key, n, best.sum))
  }
}

/** One cent-quantized input event for [[Tws.minKValues]]. */
case class ValuedEvent(user_id: Long, vq: Long)

/** Batch-bootstrapped streaming state — the backfill→stream handoff
  * every production migration needs: a historical batch aggregate seeds
  * each key's state via `handleInitialState` BEFORE the first streaming
  * row arrives, and the stream continues counting from there. Emissions
  * are monotone snapshots ([[UserTypeStatsProcessor]]'s contract), so
  * the final max() per user must equal the FULL corpus aggregate — the
  * proof the handoff lost nothing and double-counted nothing. State
  * carries the caller's `ttl` (default [[Tws.DefaultStateTtl]]) — see
  * [[UserTypeStatsProcessor]] for the TTL/TimeMode contract.
  */
class SeededCountProcessor(ttl: Option[java.time.Duration])
    extends StatefulProcessorWithInitialState[
      Long, UserTypedEvent, UserTypeStats, Long] {

  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    total = getHandle.getValueState[Long]("total",
      Encoders.scalaLong, Tws.ttlConfig(ttl))
  }

  override def handleInitialState(key: Long, initialState: Long,
                                  timers: TimerValues): Unit =
    total.update(initialState)

  override def handleInputRows(key: Long, rows: Iterator[UserTypedEvent],
                               timers: TimerValues)
  : Iterator[UserTypeStats] = {
    var t = if (total.exists()) total.get() else 0L
    rows.foreach(_ => t += 1L)
    total.update(t)
    Iterator.single(UserTypeStats(key, 0L, t))
  }
}

/** One TTL-count snapshot: `n` events seen in the CURRENT state
  * lifetime and whether prior state was still alive at batch start
  * (`resumed = false` on a key whose state the TTL evicted — the
  * observable proof of eviction).
  */
case class TtlCount(user_id: Long, n: Long, resumed: Boolean)

/** TTL-bounded state at its most observable — the demonstration twin of
  * the production processors above (which carry the same TTL machinery
  * behind a long default): a `ValueState[Long]` declared with a real
  * `TTLConfig`, so the store EVICTS a key's value once `ttl` elapses
  * after its last update (processing time — the only TimeMode TTL
  * supports). The processor counts events per user and reports
  * `resumed = cnt.exists()` at batch start: a key seen again WITHIN the
  * TTL resumes its count (`resumed = true`), a key seen after eviction
  * restarts from zero (`resumed = false`) — emission itself proves
  * eviction, no store introspection needed. With a TTL shorter than any
  * batch gap every batch starts fresh, so summing the per-batch
  * emissions reconstructs the exact corpus count regardless of how the
  * input splits — the property the gate's oracle pins.
  */
class TtlCountProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[Long, UserTypedEvent, TtlCount] {

  @transient private var cnt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    cnt = getHandle.getValueState[Long]("cnt",
      Encoders.scalaLong, TTLConfig(ttl))
  }

  override def handleInputRows(key: Long, rows: Iterator[UserTypedEvent],
                               timers: TimerValues): Iterator[TtlCount] = {
    val resumed = cnt.exists()
    var t = if (resumed) cnt.get() else 0L
    rows.foreach(_ => t += 1L)
    cnt.update(t)
    Iterator.single(TtlCount(key, t, resumed))
  }
}

/** The transformWithState operators.
  *
  * '''TTL contract''' (r11 verdict #4): every non-event-time processor
  * can declare its state with a TTL ([[DefaultStateTtl]] is the
  * recommended value) — an idle key's state is evicted instead of
  * accumulating forever, which is the difference between bounded and
  * unbounded state at 100 TB of keys. TTL is OPT-IN (`ttl = None`
  * default, ADVICE r12): a non-None ttl silently selects
  * `TimeMode.ProcessingTime`, where `shouldRunAnotherBatch` is always
  * true — a `Trigger.AvailableNow` + `awaitTermination` drain then
  * hangs forever, far from the call site that chose the ttl, so the
  * caller must choose that trade explicitly. Spark's constraints,
  * honored by the wrappers:
  *
  *   - TTL is processing-time-only: a non-NONE TTLConfig outside
  *     `TimeMode.ProcessingTime` throws (spec-pinned), so `ttl` also
  *     selects the TimeMode.
  *   - In processing TimeMode the operator always reports
  *     `shouldRunAnotherBatch = true` (TTL state may need eviction), so
  *     `Trigger.AvailableNow` never terminates and
  *     `processAllAvailable()` never returns — callers drain by polling
  *     the sink for the expected emission count (the gates' pattern),
  *     or pass `ttl = None` for a bounded replay/backfill where
  *     AvailableNow termination matters (TimeMode.None, no TTL).
  *   - The event-time [[timerSessions]] cannot carry a TTL at all (see
  *     [[TimerSessionProcessor]]) — there, the timer lifecycle is the
  *     state bound.
  */
object Tws {

  /** Default state TTL of the processing-time processors: long enough
    * that any in-session stream sees identical semantics to untimed
    * state (eviction is processing-time-relative), short enough that an
    * abandoned key's state does not outlive a month of idleness.
    */
  val DefaultStateTtl: java.time.Duration = java.time.Duration.ofDays(30)

  /** The TTLConfig spelling of an optional duration. */
  private[streaming] def ttlConfig(
      ttl: Option[java.time.Duration]): TTLConfig =
    ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)

  /** TimeMode implied by the ttl: TTL needs processing time; no TTL
    * wants TimeMode.None (bounded replays then terminate under
    * AvailableNow).
    */
  private def timeModeFor(ttl: Option[java.time.Duration]): TimeMode =
    if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()

  /** Per-user event counts under TTL-bounded state: counts resume
    * within `ttl` of the last update and restart from zero after
    * eviction, with `resumed` reporting which happened. Requires the
    * RocksDB provider (as all v2-API processors do) and runs in
    * processing TimeMode — the one TTL supports.
    */
  def ttlCounts(events: Dataset[UserTypedEvent],
                ttl: java.time.Duration): Dataset[TtlCount] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TtlCountProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Per-user (count, sum of k smallest cent values) snapshots via
    * bounded ListState; compose with "row with max n_seen per user".
    * State is TTL-bounded by default (see the object doc for the
    * TTL/TimeMode/drain contract).
    */
  def minKValues(events: Dataset[ValuedEvent], k: Int,
                 ttl: Option[java.time.Duration] = None)
  : Dataset[MinKStats] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new MinKProcessor(k, ttl),
        timeModeFor(ttl), OutputMode.Append())
  }

  /** Per-user running event counts, state seeded from `initial`
    * (user_id → historical count). Monotone snapshots; compose with
    * max() per user. State is TTL-bounded by default (see the object
    * doc for the TTL/TimeMode/drain contract).
    */
  def seededCounts(events: Dataset[UserTypedEvent],
                   initial: Dataset[(Long, Long)],
                   ttl: Option[java.time.Duration] = None)
  : Dataset[UserTypeStats] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SeededCountProcessor(ttl),
        timeModeFor(ttl), OutputMode.Append(),
        initial.groupByKey(_._1).mapValues(_._2))
  }

  /** [[TimerSessionProcessor]] wired up: watermarked input, event-time
    * TimeMode, append output — drop-in parity with
    * [[Stateful.statefulSessions]].
    */
  def timerSessions(events: Dataset[UserEvent], gapMs: Long,
                    lateness: String): Dataset[ClosedSession] = {
    val s = events.sparkSession
    import s.implicits._
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Per-user (distinct types, total events) profile snapshots; compose
    * with `groupBy(user).agg(max(...))` for the final profile (the
    * snapshots are monotone within a state lifetime). State is
    * TTL-bounded by default (see the object doc for the
    * TTL/TimeMode/drain contract).
    */
  def userTypeStats(
      events: Dataset[UserTypedEvent],
      ttl: Option[java.time.Duration] = None)
  : Dataset[UserTypeStats] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserTypeStatsProcessor(ttl),
        timeModeFor(ttl), OutputMode.Append())
  }
}

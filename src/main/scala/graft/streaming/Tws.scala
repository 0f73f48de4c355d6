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
  * Emission is a MONOTONE snapshot per (user, batch): both counters only
  * grow, so a downstream `max()` per user yields the final profile
  * regardless of how AvailableNow splits the input into micro-batches —
  * the batch-split-proof emission contract.
  */
class UserTypeStatsProcessor
    extends StatefulProcessor[Long, UserTypedEvent, UserTypeStats] {

  @transient private var total: ValueState[Long] = _
  @transient private var types: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    total = getHandle.getValueState[Long]("total",
      Encoders.scalaLong, TTLConfig.NONE)
    types = getHandle.getMapState[String, Long]("types",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
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

/** The transformWithState operators. */
object Tws {

  /** Per-user (distinct types, total events) profile snapshots; compose
    * with `groupBy(user).agg(max(...))` for the final profile (the
    * snapshots are monotone).
    */
  def userTypeStats(
      events: Dataset[UserTypedEvent]): Dataset[UserTypeStats] = {
    val s = events.sparkSession
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserTypeStatsProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}

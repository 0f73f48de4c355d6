package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The TTL contract of the production TWS processors (r11 verdict #4):
  *
  *   1. inside the TTL horizon, the TTL'd default path emits EXACTLY
  *      what the untimed (`ttl = None`) spelling emits — the gates'
  *      oracles stay valid under the production posture;
  *   2. past the horizon, state is provably EVICTED on a production
  *      processor (not just the TtlCountProcessor demo twin);
  *   3. the event-time sessionizer CANNOT carry a TTL at all — Spark
  *      rejects a non-NONE TTLConfig outside processing TimeMode — so
  *      its state bound is the timer lifecycle (see
  *      [[TimerSessionProcessor]]'s doc), and that boundary is pinned
  *      here instead of silently carried.
  */
class TwsTtlSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def withRocksDb[A](f: => A): A = {
    val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try f finally old match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  private def drain(name: String,
                    q: org.apache.spark.sql.streaming.StreamingQuery,
                    n: Long): Unit = {
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (spark.table(name).count() < n &&
      System.nanoTime() < deadline && q.exception.isEmpty)
      Thread.sleep(50L)
    q.exception.foreach(throw _)
    spark.table(name).count() shouldBe n
  }

  behavior of "Tws state TTL (production processors)"

  it should "emit identically to the untimed spelling inside the TTL " +
    "horizon (opt-in TTL path vs the ttl = None default)" in withRocksDb {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val data = Seq(
      ValuedEvent(1L, 30L), ValuedEvent(1L, 10L), ValuedEvent(1L, 20L),
      ValuedEvent(2L, 5L), ValuedEvent(2L, 50L))

    // untimed spelling: TimeMode.None terminates under a normal drain
    val inA = MemoryStream[ValuedEvent]
    val qA = Tws.minKValues(inA.toDS(), 2, ttl = None)
      .writeStream.format("memory").queryName("ttl_eq_none")
      .outputMode("append").start()
    try {
      inA.addData(data: _*)
      qA.processAllAvailable()
    } finally qA.stop()

    // production posture: opt-in TTL'd state (ADVICE r12: the default is
    // ttl = None so AvailableNow drains terminate), processing TimeMode,
    // poll-drain
    val inB = MemoryStream[ValuedEvent]
    val qB = Tws.minKValues(inB.toDS(), 2,
      ttl = Some(Tws.DefaultStateTtl))
      .writeStream.format("memory").queryName("ttl_eq_ttl")
      .outputMode("append").start()
    try {
      inB.addData(data: _*)
      drain("ttl_eq_ttl", qB, 2L)
    } finally qB.stop()

    def rows(t: String) = s.table(t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    rows("ttl_eq_ttl") shouldBe rows("ttl_eq_none")
    rows("ttl_eq_ttl") shouldBe Seq((1L, 3L, 30L), (2L, 2L, 55L))
  }

  it should "evict a production processor's state past the TTL horizon " +
    "(counts restart from zero)" in withRocksDb {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[UserTypedEvent]
    // 5 s TTL / 10 s idle (ADVICE r12: the old 2 s/3 s margin flaked on
    // loaded hosts — a late third batch or an early-expiring second
    // batch flips the resumed/restarted emissions)
    val q = Tws.userTypeStats(in.toDS(),
        ttl = Some(java.time.Duration.ofSeconds(5)))
      .writeStream.format("memory").queryName("ttl_evict")
      .outputMode("append").start()
    try {
      in.addData(UserTypedEvent(1L, "view"), UserTypedEvent(1L, "buy"))
      drain("ttl_evict", q, 1L)
      // inside the horizon: the profile RESUMES (2 types, 3 events)
      in.addData(UserTypedEvent(1L, "view"))
      drain("ttl_evict", q, 2L)
      // past the horizon: state evicted, the profile RESTARTS (1, 1)
      Thread.sleep(10000)
      in.addData(UserTypedEvent(1L, "view"))
      drain("ttl_evict", q, 3L)
      val rows = s.table("ttl_evict")
        .collect().map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._2, t._1)).toSeq
      rows shouldBe Seq(
        (1L, 1L),  // batch 3: restarted — eviction proven by emission
        (2L, 2L),  // batch 1
        (2L, 3L))  // batch 2: resumed inside the horizon
    } finally q.stop()
  }

  it should "reject TTL state outside processing TimeMode (the event-" +
    "time sessionizer's API boundary)" in withRocksDb {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.streaming._
    // a sessionizer-shaped processor that ASKS for TTL state in event
    // TimeMode — Spark must refuse at state declaration
    class TtlInEventTime
        extends StatefulProcessor[Long, UserEvent, ClosedSession] {
      override def init(outputMode: OutputMode,
                        timeMode: TimeMode): Unit = {
        getHandle.getValueState[OpenSession]("open",
          org.apache.spark.sql.Encoders.product[OpenSession],
          TTLConfig(java.time.Duration.ofDays(1)))
        ()
      }
      override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                   timers: TimerValues)
      : Iterator[ClosedSession] = Iterator.empty
    }
    val in = MemoryStream[UserEvent]
    val q = in.toDS().withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new TtlInEventTime,
        TimeMode.EventTime(), OutputMode.Append())
      .writeStream.format("memory").queryName("ttl_eventtime_reject")
      .outputMode("append").start()
    try {
      in.addData(UserEvent(1L,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      val ex = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
        q.processAllAvailable()
      }
      // walk the cause chain for the TTL/TimeMode refusal
      var c: Throwable = ex
      var found = false
      while (c != null && !found) {
        found = c.getClass.getSimpleName
          .contains("CannotAssignTTLInTimeMode") ||
          Option(c.getMessage).exists(_.contains("TTL"))
        c = c.getCause
      }
      found shouldBe true
    } finally q.stop()
  }
}

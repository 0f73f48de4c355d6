package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

class StatefulSpec extends AnyFlatSpec with Matchers with SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  behavior of "Stateful.statefulSessions"

  it should "emit a session when a later event exceeds the gap" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = Stateful.statefulSessions(
      input.toDF().toDF("user_id", "ts").as[UserEvent],
      gapMs = 30 * 60 * 1000L, lateness = "10 minutes")
    val query = sessions.writeStream.format("memory")
      .queryName("stateful_gap").outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")),
        (1L, ts("2024-01-01 10:10:00")))
      query.processAllAvailable()
      // 11:00 is beyond 10:10 + 30m → closes the first session in-line
      input.addData((1L, ts("2024-01-01 11:00:00")))
      query.processAllAvailable()
      val out = s.sql("SELECT user_id, session_start, session_end, n_events" +
          " FROM stateful_gap").collect()
      out.length shouldBe 1
      out.head.getLong(0) shouldBe 1L
      out.head.getTimestamp(1) shouldBe ts("2024-01-01 10:00:00")
      out.head.getTimestamp(2) shouldBe ts("2024-01-01 10:40:00")
      out.head.getLong(3) shouldBe 2L
    } finally query.stop()
  }

  it should "emit via event-time timeout when the watermark passes the gap" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = Stateful.statefulSessions(
      input.toDF().toDF("user_id", "ts").as[UserEvent],
      gapMs = 30 * 60 * 1000L, lateness = "10 minutes")
    val query = sessions.writeStream.format("memory")
      .queryName("stateful_timeout").outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      // A DIFFERENT user's far-future event advances the watermark past
      // user 1's gap horizon (10:30) → user 1's session must time out.
      input.addData((2L, ts("2024-01-01 12:00:00")))
      query.processAllAvailable()
      input.addData((2L, ts("2024-01-01 13:00:00")))
      query.processAllAvailable()
      val u1 = s.sql("SELECT session_start, session_end, n_events FROM " +
          "stateful_timeout WHERE user_id = 1").collect()
      u1.length shouldBe 1
      u1.head.getTimestamp(0) shouldBe ts("2024-01-01 10:00:00")
      u1.head.getTimestamp(1) shouldBe ts("2024-01-01 10:30:00")
      u1.head.getLong(2) shouldBe 1L
    } finally query.stop()
  }

  it should "agree with session_window sessionization on the same stream" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // chronological order — with zero lateness any out-of-order event
    // would be (correctly) dropped as late
    val data = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:05:00")),
      (1L, ts("2024-01-01 10:10:00")), (2L, ts("2024-01-01 10:20:00")),
      (1L, ts("2024-01-01 11:00:00")), (3L, ts("2024-01-01 12:30:00")))
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = Stateful.statefulSessions(
      input.toDF().toDF("user_id", "ts").as[UserEvent],
      gapMs = 30 * 60 * 1000L, lateness = "0 seconds")
    val query = sessions.writeStream.format("memory")
      .queryName("stateful_parity").outputMode("append").start()
    try {
      data.foreach { e => input.addData(e); query.processAllAvailable() }
      // push the watermark far ahead so every session times out
      input.addData((99L, ts("2024-01-02 00:00:00")))
      query.processAllAvailable()
      input.addData((99L, ts("2024-01-03 00:00:00")))
      query.processAllAvailable()
      val got = s.sql("SELECT user_id, session_start, session_end, n_events" +
          " FROM stateful_parity WHERE user_id <= 3").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      val expected = Sessionize.sessionCounts(
          data.toDF("user_id", "ts"), "30 minutes").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      got shouldBe expected
    } finally query.stop()
  }

  behavior of "Stateful.streamEwmaBurst"

  it should "drop hour buckets at or behind the state frontier" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[TypedHourEvent]
    val dropped = s.sparkContext.longAccumulator("ewma_guard_drops")
    val scored = Stateful.streamEwmaBurst(input.toDS(), Some(dropped))
    val query = scored.writeStream.format("memory")
      .queryName("ewma_guard").outputMode("append").start()
    try {
      // batch 1: hours 100 (seed, x=4) and 101 (x=8)
      input.addData(Seq.fill(4)(TypedHourEvent("click", 100L)) ++
        Seq.fill(8)(TypedHourEvent("click", 101L)): _*)
      query.processAllAvailable()
      // batch 2: hour 101 AGAIN (a re-split of an already-processed
      // hour) and hour 100 (out of order) — both must be dropped; hour
      // 102 advances normally from the state left by batch 1
      // (ewma after 101 = (8 + 3*4)/4 = 5).
      input.addData(Seq.fill(9)(TypedHourEvent("click", 101L)) ++
        Seq.fill(2)(TypedHourEvent("click", 100L)) ++
        Seq.fill(11)(TypedHourEvent("click", 102L)): _*)
      query.processAllAvailable()
      val out = s.sql("SELECT hb, x, prev, burst FROM ewma_guard " +
          "ORDER BY hb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      out.toSeq shouldBe Seq(
        (100L, 4L, -1L, false),   // seed
        (101L, 8L, 4L, false),    // 8 <= 2*4 — no burst
        (102L, 11L, 5L, true))    // 11 > 2*5 — burst; 101/100 replays gone
      // the discard is not silent: both dropped buckets (101 re-split,
      // 100 out-of-order) are counted into the caller's accumulator
      dropped.value shouldBe 2L
    } finally query.stop()
  }

  behavior of "Tws.timerSessions (transformWithState event-time timers)"

  it should "hold the session when the watermark only REACHES the gap " +
    "horizon and emit once it strictly passes (the re-arm path)" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val olds = s.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val gapMs = 30 * 60 * 1000L
      val input = MemoryStream[UserEvent]
      val query = Tws.timerSessions(input.toDS(), gapMs, "0 seconds")
        .writeStream.format("memory").queryName("tws_timer_rearm")
        .outputMode("append").start()
      try {
        input.addData(UserEvent(1L, ts("2024-01-01 10:00:00")))
        query.processAllAvailable()
        // another user's event puts the watermark EXACTLY at user 1's
        // horizon (10:00 + 30m) — fMGWS and the oracle both require a
        // STRICT pass, so nothing may emit; the processor must re-arm
        // instead of dropping the timer
        input.addData(UserEvent(2L, ts("2024-01-01 10:30:00")))
        query.processAllAvailable()
        input.addData(UserEvent(2L, ts("2024-01-01 10:30:00")))
        query.processAllAvailable() // extra batch: timers re-checked
        s.sql("SELECT * FROM tws_timer_rearm WHERE user_id = 1")
          .count() shouldBe 0
        // one tick past the horizon → the re-armed timer fires
        input.addData(UserEvent(2L, ts("2024-01-01 10:31:00")))
        query.processAllAvailable()
        input.addData(UserEvent(2L, ts("2024-01-01 10:32:00")))
        query.processAllAvailable()
        val u1 = s.sql("SELECT session_start, session_end, n_events " +
            "FROM tws_timer_rearm WHERE user_id = 1").collect()
        u1.length shouldBe 1
        u1.head.getTimestamp(0) shouldBe ts("2024-01-01 10:00:00")
        u1.head.getTimestamp(1) shouldBe ts("2024-01-01 10:30:00")
        u1.head.getLong(2) shouldBe 1L
      } finally query.stop()
    } finally olds match {
      case Some(v) => s.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  behavior of "Tws.userTypeStats (transformWithState v2 state API)"

  it should "converge to the batch profile across micro-batch splits " +
    "via monotone snapshots" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val olds = s.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[UserTypedEvent]
      // the PRODUCTION path: default TTL-bounded state → processing
      // TimeMode → the stream never reports "no new data", so drain by
      // polling the sink for the expected emission count instead of
      // processAllAvailable (which would hang — see Tws object doc)
      val query = Tws.userTypeStats(input.toDS())
        .writeStream.format("memory").queryName("tws_profile")
        .outputMode("append").start()
      def awaitRows(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (s.table("tws_profile").count() < n &&
          System.nanoTime() < deadline && query.exception.isEmpty)
          Thread.sleep(50L)
        query.exception.foreach(throw _)
        s.table("tws_profile").count() shouldBe n
      }
      try {
        // the same user's events split across TWO batches — the final
        // max() must still equal the single-batch ground truth
        input.addData(UserTypedEvent(1L, "view"),
          UserTypedEvent(1L, "view"), UserTypedEvent(2L, "buy"))
        awaitRows(2L)
        input.addData(UserTypedEvent(1L, "buy"),
          UserTypedEvent(1L, "view"), UserTypedEvent(2L, "buy"))
        awaitRows(4L)
        val out = s.sql("SELECT user_id, max(n_types), max(n_events) " +
            "FROM tws_profile GROUP BY user_id ORDER BY user_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        out.toSeq shouldBe Seq((1L, 2L, 4L), (2L, 1L, 2L))
        // snapshots are monotone: batch-1 rows exist and are dominated
        val u1 = s.sql("SELECT n_types, n_events FROM tws_profile " +
            "WHERE user_id = 1 ORDER BY n_events").collect()
        u1.length shouldBe 2
        u1.head.getLong(0) should be <= u1.last.getLong(0)
        u1.head.getLong(1) should be < u1.last.getLong(1)
      } finally query.stop()
    } finally olds match {
      case Some(v) => s.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  behavior of "Tws.ttlCounts (TTL-bounded state)"

  it should "resume counts within the TTL and evict state past it " +
    "(the eviction boundary, both directions)" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val olds = s.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[UserTypedEvent]
      val query = Tws.ttlCounts(input.toDS(),
          java.time.Duration.ofSeconds(5))
        .writeStream.format("memory").queryName("tws_ttl")
        .outputMode("append").start()
      // A ProcessingTime-TimeMode TWS stream never sets the no-new-data
      // flag (shouldRunAnotherBatch stays true for TTL eviction), so
      // processAllAvailable would hang — drain by polling the sink for
      // the expected emission count instead.
      def awaitRows(n: Long): Unit = {
        val deadline = System.nanoTime() + 60L * 1000000000L
        while (s.table("tws_ttl").count() < n &&
          System.nanoTime() < deadline && query.exception.isEmpty)
          Thread.sleep(50L)
        query.exception.foreach(throw _)
        s.table("tws_ttl").count() shouldBe n
      }
      try {
        input.addData(UserTypedEvent(1L, "view"))
        awaitRows(1L)
        // within the TTL: state survives, count resumes
        input.addData(UserTypedEvent(1L, "view"))
        awaitRows(2L)
        // past the TTL: state evicted, count restarts from zero
        Thread.sleep(6000)
        input.addData(UserTypedEvent(1L, "view"))
        awaitRows(3L)
        val out = s.sql(
            "SELECT n, resumed FROM tws_ttl ORDER BY n DESC, resumed")
          .collect().map(r => (r.getLong(0), r.getBoolean(1)))
        out.toSeq shouldBe Seq(
          (2L, true),   // batch 2 resumed batch 1's count (inside TTL)
          (1L, false),  // batch 1 seeded fresh
          (1L, false))  // batch 3 restarted — the eviction boundary
      } finally query.stop()
    } finally olds match {
      case Some(v) => s.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => s.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  behavior of "Stateful.windowedTypeCounts"

  it should "emit closed tumbling windows once in append mode" in {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = Stateful.windowedTypeCounts(
      input.toDF().toDF("ts", "event_type"), "10 minutes", "5 minutes")
    val query = counts.writeStream.format("memory")
      .queryName("windowed_counts").outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:01:00"), "click"),
        (ts("2024-01-01 10:02:00"), "click"),
        (ts("2024-01-01 10:03:00"), "view"))
      query.processAllAvailable()
      // advance watermark beyond 10:10 + 5m → the 10:00 window closes
      input.addData((ts("2024-01-01 10:30:00"), "click"))
      query.processAllAvailable()
      val out = s.sql("SELECT window_start, event_type, n FROM " +
          "windowed_counts ORDER BY event_type").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      out.toSeq shouldBe Seq(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 10:00:00"), "view", 1L))
    } finally query.stop()
  }
}

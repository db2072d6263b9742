package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, Session}

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowed hourly counts with watermark over MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("update").start()
    try {
      mem.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(20), 1, "click", 2.0),
        Event(3, ts(70), 2, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select("window_start", "event_type", "n_events")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "click", 2L),
        ("2024-01-01 01:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("hopping windows: each event lands in exactly two sliding windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.hoppingCounts(mem.toDF())
      .writeStream.format("memory").queryName("hopping")
      .outputMode("update").start()
    try {
      mem.addData(
        Event(1, ts(5), 1, "click", 1.0),   // windows [-0:30, 0:00]
        Event(2, ts(40), 1, "click", 2.0))  // windows [0:00, 0:30]
      q.processAllAvailable()
      val rows = spark.table("hopping")
        .select("win_start", "event_type", "n_events")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(rows == Set(
        ("2023-12-31 23:30:00.0", "click", 1L),
        ("2024-01-01 00:00:00.0", "click", 2L),
        ("2024-01-01 00:30:00.0", "click", 1L)))
    } finally q.stop()
  }

  test("late rows behind the watermark are dropped AND the drop is observable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("late_obs")
      .outputMode("update").start()
    try {
      // batch 1 advances the watermark to ts(100) - 30min = ts(70)
      mem.addData(Event(1, ts(100), 1, "click", 1.0))
      q.processAllAvailable()
      assert(EventsStream.droppedLateRows(q) == 0)
      // batch 2: a row at ts(5) is behind the watermark — silently
      // dropped from the aggregate, but VISIBLE in the progress metrics
      mem.addData(Event(2, ts(5), 1, "click", 1.0))
      q.processAllAvailable()
      assert(EventsStream.droppedLateRows(q) == 1,
        "the late-row drop must be observable in stateOperators metrics")
      val hour0 = spark.table("late_obs")
        .filter(col("window_start") === ts(0).toString.substring(0, 10) + " 00:00:00")
      assert(hour0.isEmpty, "the late row must not resurrect hour 0")
    } finally q.stop()
  }

  test("stateful sessionization closes sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = EventsStream.sessionize(spark, mem.toDS(), gapSec = 600)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // batch 1: two events 5 min apart (same session)
      mem.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(5), 7, "click", 2.0))
      q.processAllAvailable()
      // batch 2: 40 min later -> closes session 1
      mem.addData(Event(3, ts(45), 7, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").as[Session].collect()
      assert(rows.length == 1)
      val s = rows.head
      assert(s.user_id == 7 && s.n_events == 2 && s.total_value == 3.0 &&
        s.session_start == ts(0) && s.session_end == ts(5))
    } finally q.stop()
  }

  test("an idle user's open session is flushed by event-time timeout, " +
    "without a closing event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = EventsStream.sessionize(spark, mem.toDS(), gapSec = 600,
      watermark = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("idle_sessions")
      .outputMode("append").start()
    try {
      // user 7's only event; the session stays open in state
      mem.addData(Event(1, ts(0), 7, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("idle_sessions").isEmpty)
      // a DIFFERENT user's event an hour later advances the watermark
      // past user 7's gap deadline — no further event for user 7 ever
      // arrives, yet the timeout must emit and evict the session
      mem.addData(Event(2, ts(60), 8, "view", 2.0))
      q.processAllAvailable()
      val rows = spark.table("idle_sessions").as[Session].collect()
      assert(rows.length == 1)
      val s = rows.head
      assert(s.user_id == 7 && s.n_events == 1 && s.total_value == 1.0 &&
        s.session_start == ts(0) && s.session_end == ts(0))
    } finally q.stop()
  }

  test("left-outer attribution emits unattributed actions with NULL " +
    "trigger once the watermark proves no match can arrive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val triggers = MemoryStream[Event]
    val actions = MemoryStream[Event]
    val q = EventsStream.attribution(triggers.toDF(), actions.toDF(),
      horizon = "10 minutes", watermark = "10 minutes",
      joinType = "left_outer")
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    try {
      // user 7 converts with NO trigger anywhere in the horizon
      actions.addData(Event(1, ts(5), 7, "purchase", 9.0))
      q.processAllAvailable()
      // much later traffic on BOTH sides advances both watermarks past
      // the point where a trigger for event 1 could still arrive
      triggers.addData(Event(2, ts(120), 8, "click", 1.0))
      actions.addData(Event(3, ts(125), 8, "purchase", 2.0))
      q.processAllAvailable()
      val rows = spark.table("attrib_outer")
        .select("user_id", "action_id", "trigger_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows.contains((7L, 1L, -1L)),
        s"unattributed action must surface with NULL trigger, got $rows")
      assert(rows.contains((8L, 3L, 2L)), "attributed action still joins")
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.dedupeStream(mem.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "click", 2.0))
      q.processAllAvailable()
      // same ids again (at-least-once redelivery) + one new id
      mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(3, ts(2), 1, "view", 3.0))
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream attribution joins actions to in-horizon triggers only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val triggers = MemoryStream[Event]
    val actions = MemoryStream[Event]
    val q = EventsStream.attribution(triggers.toDF(), actions.toDF(),
      horizon = "10 minutes")
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      triggers.addData(
        Event(101, ts(0), 1, "impression", 0.0),   // 12 min before: outside
        Event(102, ts(8), 1, "impression", 0.0),   // 4 min before: inside
        Event(103, ts(9), 2, "impression", 0.0))   // other user: no match
      actions.addData(Event(201, ts(12), 1, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("user_id", "action_id", "trigger_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 201L, 102L)),
        "exactly the same-user trigger within the 10-minute horizon")
    } finally q.stop()
  }

  test("streaming hourly counts agree with the batch q30 on testdata") {
    // batch semantics = streaming semantics with all data in one batch
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfDir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val mem = MemoryStream[Event]
    mem.addData(events.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().toIndexedSeq)
    val q = EventsStream.hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly_full")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_full")
        .agg(sum("n_events")).head().getLong(0)
      assert(streamed == events.count())
    } finally q.stop()
  }
}

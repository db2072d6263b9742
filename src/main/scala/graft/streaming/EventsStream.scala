package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only (SURVEY.md §2.10), so these are
  * extension operators for the streaming side of a training-data
  * pipeline: windowed aggregation with watermarking, and gap-based
  * sessionization with explicit state (flatMapGroupsWithState).
  * Batch equivalents are oracle-gated (q30/q31); the streaming paths
  * are tested with MemoryStream.
  */
object EventsStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Timestamp, last: Timestamp,
                          n: Long, total: Double)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, total_value: Double)

  /** Tumbling-window counts with a watermark: the streaming twin of
    * q30_events_hourly. Late data beyond the watermark is dropped;
    * state for closed windows is evicted (bounded memory at any scale).
    */
  def hourlyCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Hopping (sliding) window counts with a watermark: the streaming
    * twin of q62 — 1 h windows every 30 min, each event feeding exactly
    * two windows. Same bounded-state story as [[hourlyCounts]]: closed
    * windows evict once the watermark passes their end, so the 2×
    * window fan-out costs a constant factor of state, never growth.
    */
  def hoppingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Rows dropped as too-late (behind the watermark) across a query's
    * recent progress history, summed over its stateful operators — the
    * operational counter a production pipeline alerts on. Watermarks
    * make state bounded by SILENTLY discarding late rows; at 100 TB
    * feed scale that loss must be observable (and alertable), not
    * invisible: a growing drop count means the watermark horizon no
    * longer covers the feed's real disorder.
    */
  def droppedLateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.iterator
      .flatMap(_.stateOperators.iterator.map(_.numRowsDroppedByWatermark))
      .sum

  /** Streaming deduplication by event id: duplicates arriving within
    * the watermark horizon are dropped; state for ids older than the
    * watermark is evicted, so memory stays bounded at any scale. The
    * streaming twin of Dedup.exact for at-least-once event feeds.
    */
  def dedupeStream(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join: each action event joins
    * the same user's trigger events from the preceding `horizon`
    * (attribution: click → impression, purchase → recommendation).
    * Both sides carry watermarks and the join condition time-bounds the
    * match, so each side's buffered state is evicted once the watermark
    * passes the horizon — bounded memory at any input rate, the one
    * property that makes stream-stream joins viable at scale.
    */
  /** `joinType = "left_outer"` additionally emits UNATTRIBUTED actions
    * (trigger columns NULL) once the watermark proves no in-horizon
    * trigger can still arrive — the "organic conversion" rows an
    * attribution pipeline must account for, with the same bounded-state
    * guarantee (outer results are held only until the watermark passes
    * the horizon).
    */
  def attribution(triggers: DataFrame, actions: DataFrame,
                  horizon: String = "10 minutes",
                  watermark: String = "30 minutes",
                  joinType: String = "inner"): DataFrame = {
    val t = triggers.withWatermark("ts", watermark)
      .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
        col("event_id").as("trigger_id"))
    val a = actions.withWatermark("ts", watermark)
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
        col("event_id").as("action_id"))
    a.join(t,
      col("a_user") === col("t_user") &&
        col("t_ts") <= col("a_ts") &&
        col("t_ts") >= col("a_ts") - expr(s"INTERVAL $horizon"),
      joinType)
      .select(col("a_user").as("user_id"), col("action_id"),
        col("trigger_id"), col("a_ts"), col("t_ts"))
  }

  /** Gap-based sessionization with explicit state. A session closes
    * when a later event for the same user arrives more than `gapSec`
    * after the previous one — OR when the event-time watermark passes
    * the session's gap deadline (EventTimeTimeout): an idle user's open
    * session is emitted and its state evicted without needing a closing
    * event, so state is bounded by ACTIVE keys, not all keys ever seen.
    * Partitioned by user_id — state scales horizontally with keys.
    *
    * The watermark is applied here (EventTimeTimeout requires one); on
    * a BATCH Dataset it is a no-op and timeouts never fire — the batch
    * twin sees pure gap-closure semantics. The timeout timestamp is
    * clamped one ms past the current watermark — a session whose
    * deadline already passed (late-arriving group) still gets one
    * firing rather than an invalid-timestamp error.
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
                 gapSec: Long = 1800,
                 watermark: String = "30 minutes"): Dataset[Session] = {
    import spark.implicits._
    val streaming = events.isStreaming
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the gap deadline with no new events:
            // flush the open session and evict the key's state
            val out = state.getOption.map(s =>
              Session(userId, s.start, s.last, s.n, s.total))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.last.getTime > gapSec * 1000L =>
                  closed ::= Session(userId, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.start, e.ts, s.n + 1, s.total + e.value))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (streaming)
                state.setTimeoutTimestamp(
                  math.max(s.last.getTime + gapSec * 1000L,
                    state.getCurrentWatermarkMs() + 1L))
            }
            closed.reverse.iterator
          }
      }
  }
}

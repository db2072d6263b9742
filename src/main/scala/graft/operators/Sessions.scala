package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Exact

/** Batch gap-based sessionization (the oracle-checkable twin of
  * graft.streaming.EventsStream.sessionize): a session breaks when the
  * gap to the previous event of the same user exceeds `gapExpr`.
  * Window-function formulation — two passes over the data, shuffled
  * once on user_id; scales as a normal wide transform.
  */
object Sessions {

  def batchSessions(events: DataFrame,
                    gapExpr: String = "INTERVAL 30 MINUTES"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(w)
    val newSession =
      when(prev.isNull || (col("ts") - prev) > expr(gapExpr), 1).otherwise(0)
    events
      .withColumn("__new", newSession)
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast(LongType))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        Exact.dsum(col("value")).as("total_value"))
  }

  /** Peak concurrency per day: the maximum number of sessions alive at
    * any instant of each day — the interval-overlap sweep (load
    * analysis, capacity planning) in a shape that scales: sessions
    * explode into the days they span (row-local sequence; span is
    * bounded by the session gap policy), each day clips its intervals
    * and sweeps a +1/-1 running sum in a window PARTITIONED by day —
    * never a global ordering. All arithmetic runs in epoch-microsecond
    * Longs (`unix_micros`), so the sweep is engine-exact; ties order
    * +1 before -1, making touching sessions count as concurrent in
    * both engines. The per-day MAX is permutation-stable inside an
    * equal-(t, delta) tie group, so the sweep's intermediate order
    * within ties cannot leak into the result.
    */
  def peakConcurrency(events: DataFrame,
                      gapExpr: String = "INTERVAL 30 MINUTES"): DataFrame = {
    val D = 86400000000L // microseconds per day
    val s = batchSessions(events, gapExpr).select(
      col("user_id"), col("session_seq"),
      expr("unix_micros(CAST(session_start AS TIMESTAMP))").as("__st"),
      expr("unix_micros(CAST(session_end AS TIMESTAMP))").as("__en"))
    val days = s.withColumn("day",
      explode(expr(s"sequence(__st div ${D}L, __en div ${D}L)")))
    val pts = days.select(col("day"),
        greatest(col("__st"), col("day") * D).as("__t"),
        lit(1L).as("__delta"), col("user_id"), col("session_seq"))
      .union(days.select(col("day"),
        least(col("__en"), (col("day") + 1) * D - 1).as("__t"),
        lit(-1L).as("__delta"), col("user_id"), col("session_seq")))
    val w = Window.partitionBy("day")
      .orderBy(col("__t"), col("__delta").desc, col("user_id"), col("session_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("__run", sum(col("__delta")).over(w))
      .groupBy(col("day"))
      .agg(max(col("__run")).as("peak_concurrency"))
  }
}

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
}

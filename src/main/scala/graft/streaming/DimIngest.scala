package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.etl.Scd2

/** Continuous SCD Type 2 dimension maintenance — the dimension-side twin
  * of FactIngest (an extension; the reference's dims are batch-loaded,
  * rahil/load_dimension_tables.py, but carry the SCD2 scaffolding on
  * their date dim, rahil/create_views.py:70-72).
  *
  * Each micro-batch of source updates is merged into the persisted
  * dimension path with `Scd2.merge` inside `foreachBatch` — the
  * micro-batch is the transaction: read current state, merge, write to
  * a staging path, atomically swap. Dimensions are bounded and
  * slow-changing, so the full-rewrite-per-batch is the right trade at
  * any scale (the unbounded table is the FACT, which appends —
  * FactIngest — and never rewrites).
  *
  * Crash safety: if a batch is reprocessed after a failure (the
  * checkpoint replays it), the merge is IDEMPOTENT — re-applying an
  * update whose attributes already match the open row is a no-op by
  * Scd2's null-safe change predicate — so at-least-once replay yields
  * exactly-once dimension state.
  */
object DimIngest {

  /** Merge one update batch into the dimension at `dimPath` as of
    * `asOf`, with an atomic staging-swap so readers never observe a
    * half-written dimension.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame, dimPath: String,
                 keyCol: String, tracked: Seq[String], asOf: String): Unit = {
    val cur = spark.read.parquet(dimPath)
    val merged = Scd2.merge(cur,
      batch.select((keyCol +: tracked).map(col): _*), keyCol, tracked, asOf)
    val fs = new Path(dimPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(dimPath + "__staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    val dst = new Path(dimPath)
    fs.delete(dst, true)
    if (!fs.rename(staging, dst))
      throw new java.io.IOException(s"atomic swap into $dimPath failed")
  }

  /** Start the continuous maintenance stream. `asOfForBatch` maps the
    * micro-batch id to the batch's effective date (a CDC feed would
    * carry it in-band; the mapping keeps replays deterministic).
    */
  def start(spark: SparkSession, updates: DataFrame, dimPath: String,
            keyCol: String, tracked: Seq[String], checkpoint: String,
            asOfForBatch: Long => String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(spark, batch, dimPath, keyCol, tracked, asOfForBatch(id))
      }
      .start()
}

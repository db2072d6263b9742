package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Snapshots

/** Continuous ingest into a SNAPSHOT table: each micro-batch commits
  * as an append version, so downstream readers get the snapshot
  * guarantees (pinned file sets, time travel back to any batch
  * boundary) on a live feed — and exactly-once holds across restarts
  * because the applied batch id rides the manifest itself.
  *
  * A parquet-appending `FileStreamSink` is exactly-once only for
  * readers that honor its `_spark_metadata`; this sink makes the
  * COMMIT the unit of atomicity instead: a replayed batch (listener
  * refire, checkpoint restart before the sink's own commit recorded)
  * sees its id already in the latest manifest's metadata and no-ops —
  * the same transactional-not-algebraic guard as RollupIngest, because
  * an append is not replay-idempotent.
  */
object SnapshotIngest {

  private val BatchKey = "batch_id"

  /** Commit one batch exactly once. Returns true if the batch was
    * applied, false if it was a replay no-op.
    */
  def ingestBatch(spark: SparkSession, table: String, batch: DataFrame,
                  batchId: Long,
                  partitionBy: Seq[(String, String)] = Nil): Boolean = {
    // scan versions newest-first for the last APPLIED batch id: an
    // interleaved meta-less commit (a manual Snapshots.commit) must
    // not blind the replay guard. Snapshots.compact additionally
    // carries meta forward, so the id also survives vacuumed history.
    val applied = Snapshots.versions(spark, table).reverseIterator
      .map(v => Snapshots.meta(spark, table, Some(v)).get(BatchKey))
      .collectFirst { case Some(b) => b.toLong }
    if (applied.contains(batchId)) return false
    require(applied.forall(_ < batchId),
      s"batch $batchId arrived after ${applied.get} was committed — " +
        "out-of-order replay the checkpoint should make impossible")
    if (batch.isEmpty) return false // parquet write of 0 rows has no files
    val mode =
      if (Snapshots.latestVersion(spark, table).isEmpty) "overwrite" else "append"
    Snapshots.commit(spark, table, batch, mode,
      withMeta = Map(BatchKey -> batchId.toString),
      partitionBy = partitionBy)
    true
  }

  /** Start the stream: every micro-batch becomes one snapshot version.
    * `partitionBy` lays each batch out under hidden-partition
    * transforms (PartitionSpec) — continuous ingest into a pruned
    * layout, e.g. month(ts) for time-ranged reads or bucketN(key) for
    * point reads, with the same exactly-once guarantee.
    */
  def start(spark: SparkSession, stream: DataFrame, table: String,
            checkpoint: String,
            partitionBy: Seq[(String, String)] = Nil): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, table, batch, batchId, partitionBy); ()
      }
      .start()
}

package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Continuously-maintained exact-dedup state over a document stream —
  * the streaming face of [[Dedup.exact]]. Each micro-batch lands as
  *
  *  - `state/batch=<id>/` — the batch's LOCAL dedup rows
  *    (content, keep_id = min id in batch, n_copies in batch).
  *
  * Exact dedup is a mergeable monoid — (min, sum) per content key —
  * so per-batch partials are append-only directories (corpus-scale
  * state written ONCE, the property that survives 100 TB) and the
  * cross-batch merge happens at serve time over unique-content-scale
  * rows, not at ingest time over the corpus. Replay idempotency is the
  * overwrite of the batch's own directory (the IndexIngest postings
  * discipline); no transactional guard is needed because no shared
  * table is rewritten.
  *
  * [[serve]] is bit-identical to running [[Dedup.exact]] over the full
  * corpus: min-of-mins and sum-of-counts over disjoint batches equal
  * the global min/count (DedupIngestSpec proves equality after a
  * multi-batch run, including a duplicate that spans batches).
  */
object DedupIngest {

  private def statePath(path: String) = s"$path/state"

  /** Absorb one micro-batch of (id, content) documents. Idempotent per
    * `batchId`: the directory overwrite replays to identical rows.
    */
  def applyBatch(batch: DataFrame, idCol: String, contentCol: String,
                 path: String, batchId: Long): Unit =
    Dedup.exact(batch, idCol, contentCol)
      .write.mode("overwrite")
      .parquet(s"${statePath(path)}/batch=$batchId")

  /** Start continuous dedup-state maintenance over a document stream. */
  def start(docs: DataFrame, idCol: String, contentCol: String,
            path: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, idCol, contentCol, path, id)
      }
      .start()

  /** The merged dedup view: (content, keep_id, n_copies) with
    * [[Dedup.exact]]'s exact schema and values — one shuffle over
    * unique-content-scale partials, never a corpus rescan.
    */
  def serve(spark: SparkSession, path: String, contentCol: String): DataFrame =
    spark.read.parquet(statePath(path))
      .groupBy(contentCol)
      .agg(min(col("keep_id")).as("keep_id"),
        sum(col("n_copies")).as("n_copies"))

  /** True when `id` was already absorbed (its directory exists) — lets
    * a caller driving applyBatch by hand (tests, backfills) skip work;
    * the streaming path needs no check because replay overwrite is a
    * no-op by value.
    */
  def hasBatch(spark: SparkSession, path: String, id: Long): Boolean = {
    val p = new Path(s"${statePath(path)}/batch=$id")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

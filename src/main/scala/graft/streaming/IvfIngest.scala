package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Ivf

/** Continuously-maintained IVF vector index — the streaming face of
  * [[Ivf]], completing the ingest trio (BM25 postings, dedup state,
  * now ANN): embeddings arrive in micro-batches, each batch's vectors
  * are assigned to their nearest coarse cell against a FROZEN
  * centroid model and land as
  *
  *  - `assign/batch=<id>/` — the batch's (vid, v, nrm, cid) rows
  *    ([[Ivf.assign]]'s schema).
  *
  * Assignment is a row-local map and the assignment of a union is the
  * union of the assignments, so per-batch partials are append-only
  * directories — corpus-scale state written ONCE (the IndexIngest
  * postings discipline), and [[search]] serves BIT-IDENTICALLY to
  * running [[Ivf.search]] over the full corpus with the same model
  * (IvfIngestSpec proves row-set equality after a multi-batch build;
  * the qs24 gate holds the served recall to qs06's oracle). That is
  * the index-update story a 100 TB embedding store needs: arriving
  * vectors pay one assignment pass, queries keep probing nprobe cells,
  * and the centroids stay a k-vector driver-side model — retraining
  * is a deliberate offline event ([[Ivf.train]] + a fresh path), never
  * an ingest-time obligation. The doubles round-trip through parquet
  * exactly, so persistence adds no drift.
  *
  * Crash discipline is [[DedupIngest]]'s: replay idempotency is the
  * batch directory overwrite, a durable [[BatchMarkers]] marker
  * (written last) makes replays after [[compact]] complete no-ops,
  * and compact reconstructs a missing marker only when the directory
  * itself proves full commit (single-table state: _SUCCESS is the
  * whole transaction), passing unprovable batches through under their
  * own ids.
  */
object IvfIngest {

  private def statePath(path: String) = s"$path/assign"

  /** Absorb one micro-batch of (id, vector) rows against the frozen
    * `model`. Idempotent per `batchId` (directory overwrite + marker).
    */
  def applyBatch(batch: DataFrame, model: Ivf.Model, idCol: String,
                 vecCol: String, path: String, batchId: Long): Unit = {
    val fs = new Path(path)
      .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    if (BatchMarkers.isAbsorbed(fs, path, batchId)) return
    Ivf.assign(batch, model, idCol, vecCol)
      .write.mode("overwrite")
      .parquet(s"${statePath(path)}/batch=$batchId")
    BatchMarkers.record(fs, path, batchId)
  }

  /** Start continuous index maintenance over an embedding stream. */
  def start(docs: DataFrame, model: Ivf.Model, idCol: String,
            vecCol: String, path: String, checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, model, idCol, vecCol, path, id)
      }
      .start()

  /** The maintained corpus assignment, bookkeeping stripped. */
  def assigned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(statePath(path)).drop("batch")

  /** True when `batchId` was absorbed — durable across [[compact]]
    * (marker-first, directory presence as the pre-marker fallback).
    */
  def hasBatch(spark: SparkSession, path: String, id: Long): Boolean = {
    val p = new Path(s"${statePath(path)}/batch=$id")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    BatchMarkers.isAbsorbed(fs, path, id) || fs.exists(p)
  }

  /** ANN top-k served from the maintained index — [[Ivf.searchAssigned]]
    * over the streamed assignment, bit-identical to a batch
    * [[Ivf.search]] with the same model over the same vectors.
    */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             model: Ivf.Model, idCol: String, vecCol: String, k: Int,
             nprobe: Int = 2): DataFrame =
    Ivf.searchAssigned(assigned(spark, path), queries, model,
      idCol, vecCol, k, nprobe)

  /** Collapse the accumulated per-batch assignment directories into
    * one — same small-files housekeeping and marker discipline as
    * [[DedupIngest.compact]]: rows are relocation-only (assignments
    * never merge), marked batches land under the oldest marked id, a
    * missing marker is reconstructed when the directory's _SUCCESS
    * proves the (single-table) transaction committed, and unprovable
    * batches pass through under their own ids for the pending replay
    * to overwrite.
    */
  def compact(spark: SparkSession, path: String, files: Int = 4): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = statePath(path)
    AtomicSwap.recover(fs, root)
    val rootP = new Path(root)
    if (!fs.exists(rootP)) return
    val ids = fs.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
    ids.filterNot(BatchMarkers.isAbsorbed(fs, path, _)).foreach { id =>
      if (fs.exists(new Path(rootP, s"batch=$id/_SUCCESS")))
        BatchMarkers.record(fs, path, id)
    }
    val (marked, unmarked) = ids.partition(BatchMarkers.isAbsorbed(fs, path, _))
    if (marked.isEmpty) return
    val minBatch = marked.min
    val cur = spark.read.parquet(root)
    val markedRows =
      if (unmarked.isEmpty) cur else cur.filter(!col("batch").isin(unmarked: _*))
    val flat = markedRows.drop("batch")
      .repartition(files)
      .withColumn("batch", lit(minBatch))
    val out =
      if (unmarked.isEmpty) flat
      else flat.unionByName(cur.filter(col("batch").isin(unmarked: _*))
        .withColumn("batch", col("batch").cast("long")))
    AtomicSwap.rewrite(fs, root, out, partitionCols = Seq("batch"))
  }
}

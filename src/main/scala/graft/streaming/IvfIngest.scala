package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *
  * RETRACTIONS: [[applyDeletes]] absorbs takedown/prune batches as
  * TOMBSTONES in their own batch-id + marker namespace; serving
  * anti-joins them (terminal per id — a replayed insert of a deleted
  * vector stays suppressed), and [[compact]] applies committed
  * tombstones physically without ever discarding them. qs28 gates
  * serve-after-ingest+delete+compact against the batch search over
  * the surviving corpus.
  */
object IvfIngest {

  private def statePath(path: String) = s"$path/assign"

  /** The retrained model rides INSIDE the assignment root (an
    * underscore-prefixed subdir is invisible to the parquet reader's
    * file listing, the `_delta_log` trick), so [[retrainSwap]]'s one
    * directory rename publishes the (model, assignment) pair as a
    * single atomic unit — a reader can never see new cells against old
    * centroids or vice versa.
    */
  private def modelSubdir(assignRoot: String) = s"$assignRoot/_model"

  /** Tombstone namespace: delete batches get their own marker root so
    * their batch-id space never collides with assignment batches.
    */
  private def tombPath(path: String) = s"$path/tombstone"
  private def tombStatePath(path: String) = s"${tombPath(path)}/ids"

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

  /** Absorb one micro-batch of DELETIONS (takedowns, dedup-driven
    * prunes — the retractions a real corpus makes that an append-only
    * index cannot express): `batch`'s `idCol` values become TOMBSTONES
    * under their own batch directory + marker namespace (ids never
    * collide with assignment batches). A tombstone is TERMINAL for an
    * id — [[assigned]]/[[search]] anti-join the tombstone set, so a
    * replayed ingest batch that re-adds a deleted vector stays
    * suppressed at serve, and [[compact]] applies tombstones
    * physically without ever discarding them (the qj14 MoR
    * discipline: the delta is change-proportional, the rewrite is a
    * deliberate compaction event). Idempotent per `batchId`
    * (overwrite + marker, exactly [[applyBatch]]'s contract).
    */
  def applyDeletes(batch: DataFrame, idCol: String, path: String,
                   batchId: Long): Unit = {
    val fs = new Path(path)
      .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
    if (BatchMarkers.isAbsorbed(fs, tombPath(path), batchId)) return
    batch.select(col(idCol).as("vid")).distinct()
      .write.mode("overwrite")
      .parquet(s"${tombStatePath(path)}/batch=$batchId")
    BatchMarkers.record(fs, tombPath(path), batchId)
  }

  /** The standing tombstone set (empty frame when no deletes ever
    * arrived — schema taken from the assignment state's vid column).
    */
  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] = {
    val tp = new Path(tombStatePath(path))
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tp)) Some(spark.read.parquet(tombStatePath(path))
      .select("vid").distinct())
    else None
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

  /** The maintained corpus assignment, bookkeeping stripped and
    * tombstoned ids suppressed (see [[applyDeletes]]).
    */
  def assigned(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read.parquet(statePath(path)).drop("batch")
    tombstones(spark, path) match {
      case Some(t) => base.join(t, Seq("vid"), "left_anti")
      case None => base
    }
  }

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

  /** The model the index currently serves with, when a [[retrainSwap]]
    * has published one (pre-swap indexes carry their model caller-side,
    * the original contract).
    */
  def currentModel(spark: SparkSession, path: String): Option[Ivf.Model] = {
    val mp = new Path(modelSubdir(statePath(path)))
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(mp)) Some(graft.operators.Models.loadIvf(spark, mp.toString))
    else None
  }

  /** Retrain the coarse quantizer on the MAINTAINED corpus and swap
    * the (model, assignment) pair atomically under readers — the
    * remediation path for centroid drift that r16 left open (the
    * centroids were frozen forever; a drifting corpus degraded recall
    * with no fix short of a manual rebuild).
    *
    *  - Retrains on [[assigned]] — the tombstone-suppressed survivors
    *    — so deleted vectors influence nothing.
    *  - Re-assigns every surviving vector against the new centroids.
    *    MARKED batches collapse under the oldest marked id (compact's
    *    convention); UNMARKED (in-flight) rows keep their own batch
    *    ids, so the pending replay's directory overwrite stays
    *    idempotent — [[applyBatch]] replays against
    *    [[currentModel]] produce bit-identical rows (assignment is
    *    deterministic).
    *  - Publishes model + assignment in ONE rename
    *    ([[AtomicSwap.rewriteStaged]]): readers see the old pair or
    *    the new pair, never a mix; [[AtomicSwap.recover]] covers every
    *    crash window because the pair travels together.
    *  - Tombstones live in their own root, UNTOUCHED by the swap —
    *    deletes stay terminal across a retrain (qs29 REQUIREs it).
    *
    * Scale shape: one [[Ivf.train]] (iters linear passes, k driver
    * rows) + one row-local re-assignment pass + the swap's two
    * metadata renames. Returns the new model.
    */
  def retrainSwap(spark: SparkSession, path: String, k: Int,
                  iters: Int = 3): Ivf.Model = {
    val root = statePath(path)
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.recover(fs, root)
    // one row per surviving vid (a re-ingested id collapses here —
    // same id means same vector in this index's contract)
    val corpus = assigned(spark, path).select("vid", "v")
      .dropDuplicates("vid")
    val model = Ivf.train(spark, corpus, "vid", "v", k, iters)
    val ids = fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
    val (marked, unmarked) =
      ids.partition(BatchMarkers.isAbsorbed(fs, path, _))
    val minBatch = if (marked.nonEmpty) marked.min else 0L
    val byBatch = spark.read.parquet(root)
      .groupBy("vid").agg(max(col("batch").cast("long")).as("batch"))
    val keepOwn: Column =
      if (unmarked.isEmpty) lit(false) else col("batch").isin(unmarked: _*)
    val reassigned = Ivf.assign(corpus, model, "vid", "v")
      .join(byBatch, Seq("vid"))
      .withColumn("batch",
        when(keepOwn, col("batch")).otherwise(lit(minBatch)).cast("long"))
    AtomicSwap.rewriteStaged(fs, root) { staging =>
      reassigned.write.mode("overwrite").partitionBy("batch")
        .parquet(staging.toString)
      graft.operators.Models.saveIvf(spark, model,
        modelSubdir(staging.toString))
    }
    model
  }

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
    // Tombstone side FIRST (marker reconstruction + collapse), so the
    // assignment pass below applies a COMMITTED tombstone set: only
    // MARKED tombstones are dropped physically, and only from MARKED
    // assignment rows — an unmarked (in-flight) batch on either side
    // passes through untouched, with the serve-time anti-join (which
    // reads ALL tombstones, in-flight included) covering the gap.
    // Tombstones are compacted but NEVER discarded, so a post-compact
    // replay that re-adds a deleted id stays suppressed (deletes are
    // terminal).
    compactOne(spark, tombStatePath(path), tombPath(path), files, None)
    compactOne(spark, statePath(path), path, files,
      committedTombstones(spark, path))
  }

  /** The vids of every MARKED (committed) tombstone batch — the set
    * [[compact]] may apply physically.
    */
  private def committedTombstones(spark: SparkSession,
                                  path: String): Option[DataFrame] = {
    val tp = new Path(tombStatePath(path))
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tp)) return None
    val marked = fs.listStatus(tp).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
      .filter(BatchMarkers.isAbsorbed(fs, tombPath(path), _))
    if (marked.isEmpty) None
    else Some(spark.read.parquet(tombStatePath(path))
      .filter(col("batch").isin(marked: _*)).select("vid").distinct())
  }

  private def compactOne(spark: SparkSession, root: String,
                         markerBase: String, files: Int,
                         applyTomb: Option[DataFrame]): Unit = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.recover(fs, root)
    val rootP = new Path(root)
    if (!fs.exists(rootP)) return
    val ids = fs.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
    ids.filterNot(BatchMarkers.isAbsorbed(fs, markerBase, _)).foreach { id =>
      if (fs.exists(new Path(rootP, s"batch=$id/_SUCCESS")))
        BatchMarkers.record(fs, markerBase, id)
    }
    val (marked, unmarked) =
      ids.partition(BatchMarkers.isAbsorbed(fs, markerBase, _))
    if (marked.isEmpty) return
    val minBatch = marked.min
    val cur = spark.read.parquet(root)
    val markedRows0 =
      if (unmarked.isEmpty) cur else cur.filter(!col("batch").isin(unmarked: _*))
    // physical tombstone apply (assignment side only): marked rows for
    // marked tombstone ids leave the state here — the serve-time
    // anti-join keeps covering everything else
    val markedRows = applyTomb match {
      case Some(t) => markedRows0.join(t, Seq("vid"), "left_anti")
      case None => markedRows0
    }
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

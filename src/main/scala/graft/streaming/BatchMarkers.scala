package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Persistent per-batch absorption markers for the append-only ingest
  * states (IndexIngest postings, DedupIngest state) — one empty file
  * per absorbed micro-batch id under `<path>/_absorbed/`.
  *
  * Why they exist: compaction relocates every batch's rows under the
  * oldest included batch id (and the AtomicSwap rewrite vacuums the
  * superseded per-batch directories in the same rename). After that,
  * "was batch N absorbed?" can no longer be answered from the
  * directory layout — N's directory is gone even though its rows
  * live on in the compacted partials. Without a durable answer,
  *
  *  - a replayed batch (stream crash before its checkpoint commit, or
  *    a manual backfill driver trusting hasBatch) would RE-APPLY rows
  *    the compacted state already contains — double-counted serve
  *    output, or, when the replayed id IS the compacted id, an
  *    overwrite that silently drops every other batch's rows;
  *  - hasBatch() would report every absorbed-then-compacted batch as
  *    missing.
  *
  * The marker is written LAST in applyBatch (after every state write),
  * so marker-present ⇒ the batch fully committed and replay can no-op;
  * marker-absent ⇒ replay re-applies, where the per-directory
  * overwrite and the transactional batch-id guards make it idempotent
  * exactly as before. Markers are metadata-scale (one empty file per
  * micro-batch, outside the swapped state roots) and survive
  * compaction untouched.
  */
object BatchMarkers {

  private def dir(path: String) = new Path(path, "_absorbed")
  private def marker(path: String, id: Long) =
    new Path(dir(path), s"batch-$id")

  /** Record `id` as fully absorbed. Idempotent. */
  def record(fs: FileSystem, path: String, id: Long): Unit = {
    fs.mkdirs(dir(path))
    fs.create(marker(path, id), true).close()
  }

  /** True when `id` was fully absorbed — durable across compaction. */
  def isAbsorbed(fs: FileSystem, path: String, id: Long): Boolean =
    fs.exists(marker(path, id))
}

package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Crash-recoverable full-rewrite swap for small, frequently-rewritten
  * tables (SCD2 dimensions, sketch rollups): write the new state to
  * `path__staging`, rename the live path aside to `path__prev`, rename
  * staging in, drop `__prev`. Readers can race only the two metadata
  * renames (never a recursive delete), and `recover` restores the live
  * path from any crash window — staging is always COMPLETE whenever
  * the live path is missing, because it is fully written while the
  * live table still exists.
  */
object AtomicSwap {

  def paths(path: String): (Path, Path, Path) =
    (new Path(path), new Path(path + "__staging"), new Path(path + "__prev"))

  /** Restore `path` after a crash mid-swap. Idempotent, cheap when clean. */
  def recover(fs: FileSystem, path: String): Unit = {
    val (dst, staging, prev) = paths(path)
    if (!fs.exists(dst)) {
      // a missing live path means the crash hit between the two swap
      // renames — staging was complete before the swap began
      if (fs.exists(staging)) {
        if (!fs.rename(staging, dst))
          throw new java.io.IOException(s"recover: rename $staging -> $dst failed")
      } else if (fs.exists(prev)) {
        if (!fs.rename(prev, dst))
          throw new java.io.IOException(s"recover: rename $prev -> $dst failed")
      }
    }
    if (fs.exists(dst)) fs.delete(prev, true)
  }

  /** Write `next` as the new content of `path` via the rename swap.
    * `partitionCols` preserves a partitioned layout across the rewrite.
    */
  def rewrite(fs: FileSystem, path: String, next: DataFrame,
              partitionCols: Seq[String] = Nil): Unit =
    rewriteStaged(fs, path) { staging =>
      val w = next.write.mode("overwrite")
      (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
        .parquet(staging.toString)
    }

  /** [[rewrite]] with caller-controlled staging: `stage` populates the
    * staging directory with ARBITRARY content (several tables, a model
    * artifact next to its data…), then the same two-rename swap
    * publishes everything it wrote AS ONE UNIT — which is what makes a
    * (model, assignment) pair atomic for readers: both travel inside
    * one directory rename ([[graft.streaming.IvfIngest.retrainSwap]]).
    * Crash windows are identical to [[rewrite]]'s and [[recover]]
    * handles them unchanged, because staging is only ever promoted
    * complete (the rename happens after `stage` returns).
    */
  def rewriteStaged(fs: FileSystem, path: String)
                   (stage: Path => Unit): Unit = {
    val (dst, staging, prev) = paths(path)
    fs.delete(staging, true) // a crashed earlier attempt's leftovers
    stage(staging)
    if (fs.exists(dst) && !fs.rename(dst, prev))
      throw new java.io.IOException(s"swap: rename $dst aside failed")
    if (!fs.rename(staging, dst))
      throw new java.io.IOException(s"swap: rename $staging -> $dst failed")
    fs.delete(prev, true)
  }
}

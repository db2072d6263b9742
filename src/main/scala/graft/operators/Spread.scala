package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Explicit-count spread for narrow inputs feeding compute-dense
  * row-local pipelines.
  *
  * A small corpus parquet is ONE scan split, and a single-file split
  * cannot be subdivided (one row group), so every row-local stage
  * derived from it runs as a single task however many cores the
  * session has. AQE cannot help: its coalescing is byte-based and
  * these rows are byte-small but compute-dense. The fix is one
  * explicit key-hash repartition to the session's core count; the
  * count must be explicit or AQE folds it straight back.
  *
  * Scale posture: the spread fires ONLY when the input has fewer
  * partitions than `defaultParallelism` — a production-scale scan
  * already has more splits than cores, so this is a no-op there and
  * never inserts a corpus-wide shuffle into a big pipeline.
  *
  * Use it SELECTIVELY: only ahead of per-row work that StageProf shows
  * as a long serial stage (the winnow fingerprint chain, the span-gram
  * explode, the deletion-neighborhood verify). Pipelines whose cost is
  * stage count / driver latency get slower, not faster — the added
  * exchange plus 32-task scheduling outweighs sub-100 ms serial stages
  * (measured on the PQ/LSH recall gates, where this was tried and
  * reverted). Apply at scan-shaped leaves only: checking the partition
  * count plans the frame, and on a shuffle-bearing frame under AQE
  * that can execute upstream stages.
  */
private[operators] object Spread {
  def ifNarrow(df: DataFrame, key: Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, key) else df
  }
}

package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.streaming.AtomicSwap

/** Table maintenance — the housekeeping a 100 TB lake needs on a
  * schedule, not in query paths. First citizen: small-file compaction.
  * Streaming ingest (FactIngest appends per micro-batch) and
  * fine-grained partitioning both accrete files far below the
  * scan-efficient size; every downstream query then pays per-file open
  * cost and tiny row groups. Compaction rewrites the table into
  * ~`targetBytes` files (per partition directory when partitioned),
  * preserving content and layout, via the crash-recoverable AtomicSwap
  * rename protocol — readers never observe a half-compacted table.
  */
object Maintenance {

  /** Total bytes of data files under `path` (ignores `_`/`.` metadata). */
  private def dataBytes(spark: SparkSession, path: String): Long = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(path), true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) total += f.getLen
    }
    total
  }

  /** Rewrite the parquet table at `path` into ~`targetBytes` output
    * files. `partitionCols` must name the table's partition columns (if
    * any) so the layout — and the partition pruning built on it —
    * survives the rewrite. `sortCols` instead range-partitions and
    * sorts the rewrite (a z-order-lite): output files then hold
    * DISJOINT key ranges, so parquet min/max statistics let a point or
    * range filter skip whole files — the data-layout half of pruning,
    * complementing directory partitioning. Returns the output file
    * count target.
    */
  def compact(spark: SparkSession, path: String,
              partitionCols: Seq[String] = Nil,
              targetBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil): Int = {
    require(partitionCols.isEmpty || sortCols.isEmpty,
      "sort within partition dirs is not supported; pick one layout axis")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.recover(fs, path)
    val n = math.max(1L, (dataBytes(spark, path) + targetBytes - 1) / targetBytes)
      .toInt
    val df = spark.read.parquet(path)
    // repartition by the partition columns so each partition dir gets
    // coalesced output (hash-spread over n tasks); unpartitioned tables
    // coalesce outright — no shuffle needed to merge files
    val compacted =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(df.col): _*)
          .sortWithinPartitions(sortCols.map(df.col): _*)
      else if (partitionCols.isEmpty) df.coalesce(n)
      else df.repartition(n, partitionCols.map(df.col): _*)
    AtomicSwap.rewrite(fs, path, compacted, partitionCols)
    n
  }
}

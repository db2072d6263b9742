package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

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

  /** Row-level delete from a partitioned table, rewriting ONLY the
    * partitions that hold matching rows (the GDPR-erasure / bad-batch
    * backfill move): partition pruning finds the affected partitions,
    * dynamic partition overwrite replaces exactly those directories
    * with their surviving rows, untouched partitions' files are never
    * read or rewritten — at 100 TB a delete touching one day costs one
    * day, not a table rewrite. Partitions left EMPTY by the delete are
    * dropped explicitly (dynamic overwrite cannot write an empty
    * partition, so their stale directories would otherwise survive).
    * Returns the number of partitions rewritten or dropped.
    */
  def deleteWhere(spark: SparkSession, path: String,
                  partitionCols: Seq[String], predicate: Column): Int = {
    val df = spark.read.parquet(path)
    val affected = df.filter(predicate)
      .select(partitionCols.map(col): _*).distinct().collect()
    if (affected.isEmpty) return 0
    val inAffected = affected.map(r =>
      partitionCols.indices.map(i =>
        col(partitionCols(i)) === lit(r.get(i))).reduce(_ && _))
      .reduce(_ || _)
    val survivors = df.filter(inAffected).filter(!predicate)
    // computed BEFORE the overwrite: afterwards the source files this
    // plan reads no longer exist
    val alive = survivors.select(partitionCols.map(col): _*).distinct()
      .collect().map(_.toSeq).toSet
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      survivors.write.mode("overwrite")
        .partitionBy(partitionCols: _*).parquet(path)
    finally prior match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // drop partitions the delete emptied (no survivors -> no overwrite)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.filterNot(r => alive.contains(r.toSeq)).foreach { r =>
      val dir = partitionCols.indices
        .map(i => s"${partitionCols(i)}=${r.get(i)}").mkString("/")
      fs.delete(new Path(s"$path/$dir"), true)
    }
    affected.length
  }
}

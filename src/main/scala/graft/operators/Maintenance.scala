package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, pmod, shiftleft, shiftright, when, xxhash64}

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
    * survives the rewrite. `sortCols` range-partitions and sorts the
    * rewrite (a z-order-lite): output files then hold DISJOINT key
    * ranges, so parquet min/max statistics let a point or range filter
    * skip whole files — the data-layout half of pruning. The two axes
    * COMPOSE: with both set, rows are range-partitioned on
    * (partitionCols ++ sortCols), so each partition directory receives
    * files with disjoint sort-key ranges — directory pruning picks the
    * partition, min/max skipping picks the files inside it, which is
    * the layout a 100 TB fact table wants (partition by year, sort by
    * key within each year). A partitioned-only compaction salts the
    * shuffle so a partition larger than `targetBytes` still splits into
    * approximately-sized files instead of one giant file per directory.
    * Returns the output file count target.
    */
  def compact(spark: SparkSession, path: String,
              partitionCols: Seq[String] = Nil,
              targetBytes: Long = 128L << 20,
              sortCols: Seq[String] = Nil): Int = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.recover(fs, path)
    val n = math.max(1L, (dataBytes(spark, path) + targetBytes - 1) / targetBytes)
      .toInt
    val df = spark.read.parquet(path)
    val layout = (partitionCols ++ sortCols).map(df.col)
    val compacted =
      if (sortCols.nonEmpty)
        // range-partition over the full layout axis: with partitionCols
        // present each task holds a contiguous (partition, sort) slab, so
        // the files it writes into any partition directory cover sort-key
        // ranges disjoint from every other task's
        df.repartitionByRange(n, layout: _*).sortWithinPartitions(layout: _*)
      else if (partitionCols.isEmpty) df.coalesce(n)
      else {
        // hash on partitionCols alone would glue each partition value to
        // ONE task (one oversized file per directory); salt with a row
        // hash bounded by the per-directory split budget so large
        // partitions shatter into ~targetBytes files
        val dirs = math.max(1L,
          df.select(partitionCols.map(df.col): _*).distinct().count())
        val split = math.max(1L, math.ceil(n.toDouble / dirs).toLong)
        val salt = pmod(xxhash64(df.columns.map(df.col): _*), lit(split))
        df.repartition(n, partitionCols.map(df.col) :+ salt: _*)
      }
    // the swap replaces the whole directory, manifest included — if one
    // was being maintained, refresh it for the same columns so the new
    // layout's (tighter, sorted) per-file ranges are what the planner
    // prunes with, instead of silently losing the manifest
    val manifestCols = graft.sources.StatsManifest.columnsOf(spark, path)
    AtomicSwap.rewrite(fs, path, compacted, partitionCols)
    if (manifestCols.nonEmpty)
      graft.sources.StatsManifest.write(spark, path, manifestCols)
    n
  }

  /** Morton/Z-order interleaving of several numeric columns, each
    * min-max scaled to `bits` bits: bit i of scaled column j lands at
    * position i*ncols + j of the z-value. Files laid out along the
    * z-curve then cover a bounded hyper-rectangle of EVERY interleaved
    * column, so parquet min/max statistics skip files for predicates on
    * ANY of them — the multi-column generalization of single-key sorted
    * compaction (which perfectly skips one column and not at all on the
    * others). Ranges (mins/maxs) are one tiny pre-agg; at 100 TB that
    * scan is a metadata-only min/max over footer stats in practice.
    */
  private def zvalue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val stats = df.agg(
      org.apache.spark.sql.functions.min(col(cols.head)).cast("double"),
      (cols.tail.map(c => org.apache.spark.sql.functions.min(col(c)).cast("double")) ++
        cols.map(c => org.apache.spark.sql.functions.max(col(c)).cast("double"))): _*).head()
    val maxVal = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      // an empty table or an all-NULL column has no range: its bits carry
      // no information, so contribute 0 and let the remaining columns
      // (or plain compaction) define the layout instead of NPE-ing
      if (stats.isNullAt(i) || stats.isNullAt(cols.length + i)) lit(0L)
      else {
        val mn = stats.getDouble(i)
        val mx = stats.getDouble(cols.length + i)
        val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
        val s = ((coalesce(col(c).cast("double"), lit(mn)) - lit(mn)) / lit(span) *
          lit(maxVal.toDouble)).cast("long")
        when(s < 0, lit(0L)).when(s > maxVal, lit(maxVal)).otherwise(s)
      }
    }
    val ncols = cols.length
    (0 until bits).flatMap { i =>
      scaled.zipWithIndex.map { case (s, j) =>
        shiftleft(shiftright(s, i).bitwiseAND(lit(1L)), i * ncols + j)
      }
    }.reduce[Column](_.bitwiseOR(_))
  }

  /** Z-order compaction: rewrite the table into ~`targetBytes` files
    * laid out along the Morton curve of `zorderCols`, composing with
    * directory partitioning exactly like sorted compaction. Use when
    * queries filter on SEVERAL independent columns — a single-key sort
    * gives perfect skipping on one column and none on the rest, while
    * z-order gives ~sqrt-of-files skipping on each.
    */
  def zorderCompact(spark: SparkSession, path: String,
                    zorderCols: Seq[String],
                    partitionCols: Seq[String] = Nil,
                    targetBytes: Long = 128L << 20): Int = {
    require(zorderCols.size >= 2, "z-order needs at least two columns; use sortCols for one")
    val bits = math.min(16, 62 / zorderCols.size)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.recover(fs, path)
    val n = math.max(1L, (dataBytes(spark, path) + targetBytes - 1) / targetBytes)
      .toInt
    val df = spark.read.parquet(path)
    val z = zvalue(df, zorderCols, bits)
    val layout = (partitionCols :+ "__z").map(col)
    val compacted = df.withColumn("__z", z)
      .repartitionByRange(n, layout: _*)
      .sortWithinPartitions(layout: _*)
      .drop("__z")
    // refresh a maintained manifest across the swap (see compact)
    val manifestCols = graft.sources.StatsManifest.columnsOf(spark, path)
    AtomicSwap.rewrite(fs, path, compacted, partitionCols)
    if (manifestCols.nonEmpty)
      graft.sources.StatsManifest.write(spark, path, manifestCols)
    n
  }

  // ---------------------------------------------------------------------
  // deleteWhere: partition-surgical row deletes, crash-recoverable.
  //
  // Protocol (per-partition generalization of AtomicSwap):
  //   1. recoverDelete()          — roll forward any crashed prior delete
  //   2. write surviving rows of the affected partitions to
  //      `path__delstage` (live table untouched, fully readable)
  //   3. atomically publish a journal `path/._delete_journal` (hidden
  //      from readers) listing KEEP/DROP per affected partition — the
  //      commit point: before it, recovery discards the stage; after it,
  //      recovery rolls forward
  //   4. per partition: rename the live dir aside under `path/.delprev/`
  //      then rename the staged dir in — readers race only renames,
  //      never a recursive delete
  //   5. drop the aside dirs, the stage, the journal
  // ---------------------------------------------------------------------

  private def stagePath(path: String) = new Path(path + "__delstage")
  private def journalPath(path: String) = new Path(path, "._delete_journal")
  private def asidePath(path: String) = new Path(path, ".delprev")

  /** Hive-style partition-path escaping (subset Spark writes): NULL maps
    * to `__HIVE_DEFAULT_PARTITION__`, reserved path characters are
    * %-encoded. Mirrors what `DataFrameWriter.partitionBy` produces so
    * composed directory names locate the directories Spark wrote.
    */
  private def partSegment(colName: String, v: Any): String = {
    if (v == null) return s"$colName=__HIVE_DEFAULT_PARTITION__"
    val needEscape = "\"#%'*/:=?\\{[]^"
    val sb = new StringBuilder
    v.toString.foreach { c =>
      // \u007F (DEL) is in Spark/Hive's escape set alongside the
      // C0 controls — missing it here would compose a DROP path that
      // never matches the directory Spark wrote
      if (c < ' ' || c == '\u007F' || needEscape.contains(c)) sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    s"$colName=${sb.toString}"
  }

  /** Relative partition directories present under `root`, `depth` levels
    * deep (one level per partition column), skipping hidden entries.
    */
  private def listPartitionDirs(fs: FileSystem, root: Path, depth: Int): Seq[String] = {
    def walk(p: Path, d: Int, rel: String): Seq[String] =
      if (!fs.exists(p)) Nil
      else if (d == 0) Seq(rel)
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .flatMap(s => walk(s.getPath,
          d - 1, if (rel.isEmpty) s.getPath.getName else s"$rel/${s.getPath.getName}"))
    walk(root, depth, "")
  }

  private def renameInto(fs: FileSystem, src: Path, dst: Path): Unit = {
    val parent = dst.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    if (fs.exists(src) && !fs.rename(src, dst))
      throw new java.io.IOException(s"deleteWhere: rename $src -> $dst failed")
  }

  /** Roll forward a delete that crashed mid-publish. Idempotent and
    * cheap when clean; called automatically at every `deleteWhere`
    * entry. Before the journal exists nothing live was touched, so the
    * stage is simply discarded; once the journal exists the staged
    * survivors are complete, so each KEEP partition is (re)swapped in
    * and each DROP partition removed.
    */
  def recoverDelete(spark: SparkSession, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val journal = journalPath(path)
    if (fs.exists(journal)) {
      val in = fs.open(journal)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
      lines.foreach { line =>
        val (op, rel) = line.splitAt(5) // "KEEP " / "DROP "
        val live = new Path(path, rel)
        val staged = new Path(stagePath(path), rel)
        op.trim match {
          case "KEEP" if fs.exists(staged) =>
            fs.delete(live, true) // crash-window cleanup, no reader contract
            renameInto(fs, staged, live)
          case "DROP" => fs.delete(live, true)
          case _ => ()
        }
      }
      fs.delete(journal, false)
    }
    fs.delete(asidePath(path), true)
    fs.delete(stagePath(path), true)
    fs.delete(new Path(path, "._delete_journal.tmp"), false)
  }

  /** Row-level delete from a partitioned table, rewriting ONLY the
    * partitions that hold matching rows (the GDPR-erasure / bad-batch
    * backfill move): partition pruning finds the affected partitions,
    * their surviving rows are staged beside the table, then swapped in
    * per-partition via renames — untouched partitions' files are never
    * read or rewritten, so at 100 TB a delete touching one day costs one
    * day, not a table rewrite. SQL DELETE semantics: only rows where
    * `predicate` is TRUE are removed — rows where it evaluates NULL
    * survive. NULL partition values are handled (null-safe match,
    * `__HIVE_DEFAULT_PARTITION__` directories). Crash-recoverable: a
    * crash anywhere leaves the table readable, and the next call (or
    * `recoverDelete`) completes or discards the interrupted delete.
    * Partitions left EMPTY by the delete are dropped. Returns the
    * number of partitions rewritten or dropped.
    */
  def deleteWhere(spark: SparkSession, path: String,
                  partitionCols: Seq[String], predicate: Column): Int = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDelete(spark, path)
    val df = spark.read.parquet(path)
    // three-valued logic: a NULL predicate must neither select a
    // partition nor delete a row
    val hit = coalesce(predicate, lit(false))
    val affected = df.filter(hit)
      .select(partitionCols.map(col): _*).distinct().collect()
    if (affected.isEmpty) return 0
    // null-safe partition match: col === lit(null) is never true, so a
    // NULL partition value would silently escape the delete without <=>
    val inAffected = affected.map(r =>
      partitionCols.indices.map(i =>
        col(partitionCols(i)) <=> lit(r.get(i))).reduce(_ && _))
      .reduce(_ || _)
    val survivors = df.filter(inAffected).filter(!hit)

    // stage the affected partitions' surviving rows beside the live
    // table — source files stay intact while this plan reads them
    val stage = stagePath(path)
    survivors.write.mode("overwrite")
      .partitionBy(partitionCols: _*).parquet(stage.toString)

    // KEEP = staged dirs as Spark actually named them; DROP = affected
    // partitions the delete emptied (composed names, same escaping)
    val keep = listPartitionDirs(fs, stage, partitionCols.length).toSet
    val affectedRels = affected.map(r =>
      partitionCols.indices.map(i => partSegment(partitionCols(i), r.get(i)))
        .mkString("/"))
    val drop = affectedRels.filterNot(keep)

    // publish the journal atomically (write-then-rename): the commit point
    val journal = journalPath(path)
    val tmp = new Path(path, "._delete_journal.tmp")
    val out = fs.create(tmp, true)
    try out.write((keep.toSeq.sorted.map("KEEP " + _) ++ drop.sorted.map("DROP " + _))
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, journal))
      throw new java.io.IOException(s"deleteWhere: journal publish failed at $journal")

    // swap: readers race only renames, never a recursive delete
    val aside = asidePath(path)
    keep.toSeq.sorted.foreach { rel =>
      renameInto(fs, new Path(path, rel), new Path(aside, rel))
      renameInto(fs, new Path(stage, rel), new Path(path, rel))
    }
    drop.foreach(rel => renameInto(fs, new Path(path, rel), new Path(aside, rel)))
    fs.delete(aside, true)
    fs.delete(stage, true)
    fs.delete(journal, false)
    affected.length
  }
}

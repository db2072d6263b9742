package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name, max, min}

/** Persisted per-file min/max statistics for driver-side scan planning —
  * the manifest half of the lakehouse layout story (Delta/Iceberg keep
  * the same shape in their metadata layers).
  *
  * Parquet footers already carry min/max, but the executor only consults
  * them AFTER the driver has listed every file and scheduled a task per
  * split: at 100 TB that is millions of footer opens for a query that
  * touches one key range. A manifest beside the table lets the DRIVER
  * drop non-intersecting files before the scan exists, which is what
  * makes sorted/z-order compaction (`Maintenance.compact(sortCols)`,
  * `Maintenance.zorderCompact`) pay off at planning time rather than
  * task-skipping time.
  *
  * Format: `_stats_manifest` (underscore prefix — Spark data readers
  * ignore it) holding one line per data file:
  * `relativePath\tcol\tmin\tmax` with values in a compare-stable text
  * encoding (numerics zero-padded via SQL `format_string`? no — see
  * below: values are stored raw and compared TYPED at prune time).
  *
  * The manifest is rebuilt in ONE distributed pass (group-by on
  * `input_file_name`), so refreshing it after compaction costs a scan
  * of the rewritten files only if called per-partition; here it is a
  * table-level refresh, bounded by one row per (file, column) at the
  * driver — metadata-scale, like the listing itself.
  */
object StatsManifest {

  private def manifestPath(table: String) = new Path(table, "_stats_manifest")

  /** Orderable types the manifest supports. Anything else is rejected at
    * write() time — a type cmp() can't order (boolean, binary, array,
    * struct, map) must never enter the manifest, where it would fall
    * back to text comparison and prune files whose true range
    * intersects (silent row loss).
    */
  private def supportedType(typeName: String): Boolean = typeName match {
    case "integer" | "long" | "short" | "byte" => true
    case "double" | "float" => true
    case "string" | "date" | "timestamp" | "timestamp_ntz" => true
    case t if t.startsWith("decimal(") => true
    case _ => false
  }

  /** Percent-encode the manifest's field/record delimiters. A string
    * column whose min/max contains a tab or newline would otherwise
    * corrupt its line — worse, an embedded newline could fabricate a
    * well-formed stats row for an arbitrary path and cause WRONG
    * pruning (row loss) instead of the documented conservative keep.
    */
  private def enc(v: String): String = {
    val sb = new StringBuilder(v.length)
    v.foreach {
      case '%' => sb.append("%25")
      case '\t' => sb.append("%09")
      case '\n' => sb.append("%0A")
      case '\r' => sb.append("%0D")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def dec(v: String): String = {
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '%' && i + 3 <= v.length) {
        sb.append(Integer.parseInt(v.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(v.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** One manifest line per (file, column) of `df`, which must read from
    * under `table` (stats grouped by `input_file_name`).
    */
  private def statsLines(table: String, df: DataFrame, cols: Seq[String]): String = {
    val types = cols.map(c => c -> df.schema(c).dataType.typeName).toMap
    val bad = cols.filterNot(c => supportedType(types(c)))
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"StatsManifest: unsupported (un-orderable) column types: " +
          bad.map(c => s"$c:${types(c)}").mkString(", "))
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val rows = df.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one row per data FILE: driver metadata, like the listing
    val root = new Path(table).toUri.getPath
    val sb = new StringBuilder
    rows.foreach { r =>
      val uri = new java.net.URI(r.getAs[String]("__file")).getPath
      val rel = uri.stripPrefix(root).stripPrefix("/")
      cols.foreach { c =>
        val lo = r.getAs[Any](s"min_$c")
        val hi = r.getAs[Any](s"max_$c")
        if (lo != null && hi != null)
          sb.append(s"${enc(rel)}\t$c\t${types(c)}\t${enc(lo.toString)}\t${enc(hi.toString)}\n")
      }
    }
    sb.toString
  }

  /** Atomic write-then-rename publish (readers see old or new, whole). */
  private def publish(spark: SparkSession, table: String, content: String): Unit =
    publishAt(spark, table, manifestPath(table), "._stats_manifest.tmp", content)

  private def publishAt(spark: SparkSession, table: String, target: Path,
                        tmpName: String, content: String): Unit = {
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(table, tmpName)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"manifest publish failed for $target")
  }

  /** Rebuild the manifest for `cols` (numeric, string, or date — any
    * orderable parquet type; values are stored as text and re-typed at
    * prune time from the recorded type name).
    */
  def write(spark: SparkSession, table: String, cols: Seq[String]): Unit =
    publish(spark, table, statsLines(table, spark.read.parquet(table), cols))

  /** Extend the manifest to files it doesn't cover yet — the streaming
    * companion to [[write]]: a continuous ingest appends files every
    * micro-batch, and without maintenance the (stale-SAFE) prune decays
    * toward keep-everything. Reads ONLY the uncovered files, merges
    * their stats under the existing lines, and republishes atomically.
    * Idempotent by construction — covered files are skipped — so a
    * crash-replay (listener refire, restarted query) is a no-op.
    * Returns the number of newly covered files.
    */
  def appendMissing(spark: SparkSession, table: String,
                    colsIfNew: Seq[String] = Nil): Int = {
    val fs = manifestPath(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cols = columnsOf(spark, table) match {
      case Nil => colsIfNew
      case cs => cs
    }
    if (cols.isEmpty) return 0
    val existing =
      if (!fs.exists(manifestPath(table))) ""
      else {
        val in = fs.open(manifestPath(table))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      }
    val covered = existing.linesIterator.flatMap(_.split('\t') match {
      case Array(rel, _, _, _, _) => Some(dec(rel))
      case _ => None
    }).toSet
    val missing = listDataFiles(spark, fs, table)
      .filterNot(f => covered.contains(relOf(table, f)))
    if (missing.isEmpty) return 0
    val df = spark.read.option("basePath", table).parquet(missing: _*)
    publish(spark, table, existing + statsLines(table, df, cols))
    missing.size
  }

  /** Columns the table's manifest currently tracks (empty if none) —
    * lets a rewrite (compaction) refresh the manifest for the same
    * columns without the caller re-stating them.
    */
  def columnsOf(spark: SparkSession, table: String): Seq[String] = {
    val fs = manifestPath(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifestPath(table))) return Nil
    val in = fs.open(manifestPath(table))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    lines.flatMap(_.split('\t') match {
      case Array(_, c, _, _, _) => Some(c)
      case _ => None
    }).distinct
  }

  private def cmp(typeName: String, a: String, b: String): Int = typeName match {
    case "integer" | "long" | "short" | "byte" => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" | "float" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case t if t.startsWith("decimal(") => // '9.5' vs '12.0' compares wrong as text
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case _ => a.compareTo(b) // string / date / timestamp: ISO text orders correctly
  }

  /** Files of `table` whose [min,max] for `column` intersects [lo,hi] —
    * the driver-side prune. Files with no manifest row for the column
    * (written after the last refresh, or all-NULL) are conservatively
    * KEPT, so a stale manifest can only under-prune, never lose rows.
    */
  private def relOf(table: String, file: String): String =
    file.stripPrefix(new Path(table).toUri.getPath).stripPrefix("/")

  /** Data files under `table`: skips any path with a hidden SEGMENT —
    * a streaming sink's `_spark_metadata/0` has a plain file name but
    * lives under a metadata directory Spark readers ignore.
    *
    * When `_spark_metadata` EXISTS the raw listing is wrong, not just
    * noisy: a FileStreamSink leaves orphaned files from aborted
    * micro-batch attempts on disk, and readers honoring the commit log
    * skip them. Listing those orphans here would hand them stats rows
    * (via `appendMissing`) and serve them through `rangeRead`,
    * returning duplicate rows a plain `spark.read.parquet(table)` —
    * which plans through `MetadataLogFileIndex` on a sink root —
    * excludes, breaking the documented full-scan equivalence. So for a
    * sink root we enumerate COMMITTED files the same way a reader
    * does: plan a read of the table and take its `inputFiles`.
    */
  private def listDataFiles(spark: SparkSession,
                            fs: org.apache.hadoop.fs.FileSystem,
                            table: String): Seq[String] = {
    if (fs.exists(new Path(table, "_spark_metadata"))) {
      spark.read.parquet(table).inputFiles.toSeq
        .map(f => new java.net.URI(f).getPath)
    } else {
      val it = fs.listFiles(new Path(table), true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath
        val rel = relOf(table, f.toUri.getPath)
        val hidden = rel.split('/')
          .exists(seg => seg.startsWith("_") || seg.startsWith("."))
        if (!hidden) buf += f.toUri.getPath
      }
      buf.result()
    }
  }

  def candidateFiles(spark: SparkSession, table: String, column: String,
                     lo: String, hi: String): Seq[String] = {
    val fs = manifestPath(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    filterByStats(spark, table, listDataFiles(spark, fs, table), column, lo, hi)
  }

  /** Prune an EXPLICIT file universe (absolute paths under `table`) by
    * the manifest's per-file stats — the composition point for layers
    * that own their file listing, e.g. a snapshot version's pinned
    * set: the caller decides WHICH files exist, the manifest decides
    * which of them can intersect [lo, hi]. Files without a stats row
    * are conservatively kept, as ever.
    */
  def filterByStats(spark: SparkSession, table: String, files: Seq[String],
                    column: String, lo: String, hi: String): Seq[String] = {
    val fs = manifestPath(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(manifestPath(table))) return files
    val in = fs.open(manifestPath(table))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    val root = new Path(table).toUri.getPath
    val stats = lines.flatMap { l =>
      l.split('\t') match {
        case Array(rel, c, tn, mn, mx) if c == column =>
          Some(dec(rel) -> (tn, dec(mn), dec(mx)))
        case _ => None
      }
    }.toMap
    files.filter { f =>
      val rel = f.stripPrefix(root).stripPrefix("/")
      stats.get(rel) match {
        case Some((tn, mn, mx)) => cmp(tn, mx, lo) >= 0 && cmp(tn, mn, hi) <= 0
        case None => true // unknown file: keep (stale manifest is safe)
      }
    }
  }

  // ----- Two-level (partition-grouped) stats manifest -------------------
  //
  // The single-file manifest above collects one row per data file on
  // the driver at WRITE time and parses every line at PRUNE time —
  // fine at gate scale (10³ files), but at 100 TB ≈ 10⁶ files that is
  // GBs of driver state for a query touching one key range. The
  // two-level layout bounds driver state by PARTITION count instead:
  //
  //   _stats_manifest_parts            one line per (partition dir,
  //                                    col): part, col, type, min,
  //                                    max, n_files, file-set
  //                                    fingerprint — partition-scale,
  //                                    read whole at prune time
  //   _stats_manifest_files/<part>     that partition's per-file lines
  //                                    (the write() 5-field format) —
  //                                    opened ONLY for partitions the
  //                                    parts summary could not decide
  //
  // Write side is ONE distributed pass: per-file stats group by
  // input_file_name exactly as statsLines, but the per-file rows are
  // WRITTEN BY SPARK (partitionBy on a partition index) instead of
  // collected — the driver holds only the partition-scale summary and
  // the partition-name index, never a per-file row.
  //
  // Prune side decides per partition: range intersects → open that
  // partition's per-file lines and prune file by file; range disjoint
  // AND the universe's file set matches the recorded one (count AND
  // fingerprint — count alone misses an equal-count replacement) →
  // drop the whole partition WITHOUT touching per-file rows; disjoint
  // but set mismatch (files appended/replaced since the manifest) →
  // open and prune per file, keeping unknown files. Unknown
  // partitions and unknown files are always kept — the same
  // stale-manifest-is-safe, never-lose-rows contract as filterByStats.

  private def partsPath(table: String) = new Path(table, "_stats_manifest_parts")
  private def filesDir(table: String) = new Path(table, "_stats_manifest_files")

  /** Per-partition prune outcome: the surviving files, how many
    * partitions the universe spanned, and how many per-file stats
    * files the prune had to open — the number a 100 TB planner pays
    * for (the qj24 gate requires it to be a strict subset).
    */
  final case class TwoLevelPrune(files: Seq[String], partsTotal: Int,
                                 partsOpened: Int)

  private def encCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.regexp_replace
    // %-escape first, then the delimiters — mirrors enc()
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "%", "%25"), "\t", "%09"), "\n", "%0A"), "\r", "%0D")
  }

  /** Order-independent fingerprint of a partition's file SET (XOR of
    * xxhash64 over relative paths, seed 42 — the SQL `xxhash64`
    * default, so the distributed agg below and this driver-side
    * recompute agree bit-for-bit). The parts summary records it next
    * to n_files, and the drop-whole-partition decision requires BOTH
    * to match: file count alone misses an equal-count replacement
    * (delete one file, append another with out-of-band values), and
    * it misses a pinned-snapshot universe that happens to have the
    * same cardinality as the live partition — either would drop a
    * partition whose per-file stats were never consulted, losing
    * rows. Names are a set, never a multiset, within one directory,
    * so XOR cancellation can't occur.
    */
  private def fpOf(rels: Iterable[String]): String = {
    var acc = 0L
    rels.foreach { r =>
      acc ^= org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(r),
        org.apache.spark.sql.types.StringType, 42L)
    }
    java.lang.Long.toHexString(acc)
  }

  /** The distributed twin of [[fpOf]] over a `__rel` column. */
  private def fpAgg: org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr("bit_xor(xxhash64(__rel))")

  /** `input_file_name()` is a URI — percent-encoded — while the rel
    * keys everywhere else ([[statsLines]], [[relOf]]) come from
    * DECODED paths. Deriving `__rel` with instr() on the raw string
    * made a table path containing a space/%/non-ASCII produce garbage
    * keys (the prune silently degrades to keep-everything), and a
    * single quote broke the spliced SQL literal outright. Decode via
    * java.net.URI exactly like statsLines; runs on per-FILE grouped
    * rows only — metadata-scale, never the data path (the one place a
    * UDF is the right tool: java.net.URI semantics, N_files rows).
    * A root that doesn't prefix the decoded path yields the full path,
    * which matches no reader key — the file is conservatively kept.
    */
  private val uriPathUdf = org.apache.spark.sql.functions.udf((s: String) =>
    try new java.net.URI(s).getPath catch { case _: Exception => s })

  private def relColOf(rootPath: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{length, lit, locate, when}
    val p = uriPathUdf(col("__file"))
    val pos = locate(rootPath + "/", p)
    when(pos > 0, p.substr(pos + lit(rootPath.length + 1), length(p)))
      .otherwise(p)
  }

  /** Rebuild the two-level manifest for a DIRECTORY-PARTITIONED table
    * (every data file under at least one subdirectory of `table`; the
    * first path segment is the partition). One distributed stats pass;
    * driver state is partition-scale only.
    */
  def writePartitioned(spark: SparkSession, table: String,
                       cols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{concat_ws, count, expr, lit,
      substring_index, array, struct, explode}
    val df = spark.read.parquet(table)
    val types = cols.map(c => c -> df.schema(c).dataType.typeName).toMap
    val bad = cols.filterNot(c => supportedType(types(c)))
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"StatsManifest: unsupported (un-orderable) column types: " +
          bad.map(c => s"$c:${types(c)}").mkString(", "))
    val rootPath = new Path(table).toUri.getPath
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val perFile = df.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__rel", relColOf(rootPath))
      .withColumn("__part", substring_index(col("__rel"), "/", 1))
      .localCheckpoint() // two consumers below; stats scan runs once

    // partition-scale summary: (part, per-col min/max, file count,
    // file-set fingerprint)
    val partAggs = cols.flatMap(c =>
      Seq(min(col(s"min_$c")).as(s"pmin_$c"), max(col(s"max_$c")).as(s"pmax_$c")))
    val partRows = perFile.groupBy("__part")
      .agg(count(lit(1)).as("__nf"), partAggs :+ fpAgg.as("__fp"): _*)
      .collect() // ONE row per partition dir: bounded driver metadata
    val parts = partRows.map(_.getAs[String]("__part")).sorted
    if (parts.exists(p => p == null || !p.contains("=") && p.endsWith(".parquet")))
      throw new IllegalArgumentException(
        "writePartitioned needs a directory-partitioned table " +
          "(files directly under the root: use write() instead)")
    val sb = new StringBuilder
    partRows.foreach { r =>
      val part = r.getAs[String]("__part")
      val nf = r.getAs[Long]("__nf")
      val fp = java.lang.Long.toHexString(r.getAs[Long]("__fp"))
      cols.foreach { c =>
        val lo = r.getAs[Any](s"pmin_$c")
        val hi = r.getAs[Any](s"pmax_$c")
        if (lo != null && hi != null)
          sb.append(s"${enc(part)}\t$c\t${types(c)}\t${enc(lo.toString)}" +
            s"\t${enc(hi.toString)}\t$nf\t$fp\n")
      }
    }

    // per-file lines, written BY SPARK under a numeric partition index
    // (numeric so partitionBy never escapes the directory name), then
    // renamed to the partition's own name — rename work is
    // partition-scale, row data never visits the driver
    val pidx = parts.zipWithIndex.toMap
    val idxDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        pidx.toSeq.map { case (p, i) =>
          org.apache.spark.sql.Row(p, i)
        }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__part",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__pidx",
          org.apache.spark.sql.types.IntegerType))))
    val lineStructs = cols.map(c => struct(
      lit(c).as("c"), lit(types(c)).as("t"),
      col(s"min_$c").cast("string").as("lo"),
      col(s"max_$c").cast("string").as("hi")))
    val lines = perFile
      .join(org.apache.spark.sql.functions.broadcast(idxDf), Seq("__part"))
      .select(col("__pidx"), col("__rel"), explode(array(lineStructs: _*)).as("s"))
      .filter(col("s.lo").isNotNull && col("s.hi").isNotNull)
      .select(col("__pidx"), concat_ws("\t",
        encCol(col("__rel")), col("s.c"), col("s.t"),
        encCol(col("s.lo")), encCol(col("s.hi"))).as("line"))
    writePerPartLines(spark, table, lines, pidx, filesDir(table),
      "._stats_manifest_files.tmp")
    // the parts summary is published LAST: readers treat a missing
    // parts file as "no two-level manifest" and fall back to keeping
    // everything, so a crash mid-write can only under-prune
    publishAt(spark, table, partsPath(table), "._stats_manifest_parts.tmp",
      sb.toString)
  }

  /** Spark-write a (__pidx, line) frame as one text file per partition
    * under `target/<enc(part)>` — the per-file rows of both two-level
    * manifests go through here, so row data never visits the driver;
    * the rename loop is partition-scale.
    */
  private def writePerPartLines(spark: SparkSession, table: String,
                                lines: DataFrame, pidx: Map[String, Int],
                                target: Path, stagingName: String): Unit = {
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(table, stagingName)
    fs.delete(staging, true)
    lines.repartition(col("__pidx"))
      .write.partitionBy("__pidx").text(staging.toString)
    fs.delete(target, true)
    fs.mkdirs(target)
    pidx.foreach { case (part, i) =>
      val src = new Path(staging, s"__pidx=$i")
      val dst = new Path(target, enc(part))
      if (fs.exists(src)) {
        // usually one text part-file per index (repartition by __pidx);
        // concatenate defensively if the writer split it
        val texts = fs.listStatus(src).map(_.getPath)
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        if (texts.length == 1) fs.rename(texts.head, dst)
        else {
          val out = fs.create(dst, true)
          try texts.foreach { t =>
            val in = fs.open(t)
            try {
              val buf = new Array[Byte](1 << 16)
              var n = in.read(buf)
              while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
            } finally in.close()
          } finally out.close()
        }
      }
    }
    fs.delete(staging, true)
  }

  /** Extend the two-level manifest to partitions whose on-disk file
    * count no longer matches the recorded one — the streaming
    * companion to [[writePartitioned]] (the [[appendMissing]]
    * discipline at partition granularity): a continuous ingest appends
    * files every micro-batch, and without maintenance every touched
    * partition decays to open-and-keep-unknowns. Re-scans ONLY the
    * stale partitions' files (one distributed pass over that subset),
    * rewrites only their per-file stats files, and republishes the
    * parts summary last. Untouched partitions' stats files are not
    * read, not rewritten. Idempotent: a replay sees matching counts
    * and no-ops. Returns the number of refreshed partitions.
    */
  def refreshStalePartitions(spark: SparkSession, table: String): Int = {
    import org.apache.spark.sql.functions.{concat_ws, count, expr, lit,
      substring_index, array, struct, explode}
    val fs = partsPath(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(partsPath(table))) return 0
    val in = fs.open(partsPath(table))
    val plines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    // (part, col, nfiles, fp?, raw line) rows; legacy 6-field lines
    // (pre-fingerprint) parse with fp = None and therefore always read
    // as stale below — the first refresh upgrades them in place
    val rows = plines.flatMap { l =>
      l.split('\t') match {
        case a if a.length == 6 || a.length == 7 =>
          Some((dec(a(0)), a(1), a(5).toLong,
            if (a.length == 7) Some(a(6)) else None, l))
        case _ => None
      }
    }
    val cols = rows.map(_._2).distinct
    if (cols.isEmpty) return 0
    val recorded = rows.groupBy(_._1).view
      .mapValues(h => (h.head._3, h.head._4)).toMap
    val byPart = listDataFiles(spark, fs, table).groupBy { f =>
      val rel = relOf(table, f)
      if (rel.contains("/")) rel.substring(0, rel.indexOf('/')) else ""
    }
    // stale = count OR file-set fingerprint mismatch: an equal-count
    // replacement (delete one file, append another) must refresh too,
    // or the drop-whole prune would trust a summary describing files
    // that no longer exist
    val stale = byPart.filter { case (p, fl) =>
      recorded.get(p) match {
        case Some((nf, fp)) =>
          fl.size != nf || !fp.contains(fpOf(fl.map(relOf(table, _))))
        case None => true // brand-new partition
      }
    }
    if (stale.isEmpty) return 0

    val df = spark.read.option("basePath", table)
      .parquet(stale.values.flatten.toSeq: _*)
    val types = cols.map(c => c -> df.schema(c).dataType.typeName).toMap
    val rootPath = new Path(table).toUri.getPath
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    val perFile = df.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__rel", relColOf(rootPath))
      .withColumn("__part", substring_index(col("__rel"), "/", 1))
      .localCheckpoint()
    val partAggs = cols.flatMap(c =>
      Seq(min(col(s"min_$c")).as(s"pmin_$c"), max(col(s"max_$c")).as(s"pmax_$c")))
    val partRows = perFile.groupBy("__part")
      .agg(count(lit(1)).as("__nf"), partAggs :+ fpAgg.as("__fp"): _*)
      .collect() // stale partitions only: bounded driver metadata

    // rewrite ONLY the stale partitions' per-file stats files
    val parts = partRows.map(_.getAs[String]("__part")).sorted
    val pidx = parts.zipWithIndex.toMap
    val idxDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        pidx.toSeq.map { case (p, i) => org.apache.spark.sql.Row(p, i) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__part",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__pidx",
          org.apache.spark.sql.types.IntegerType))))
    val lineStructs = cols.map(c => struct(
      lit(c).as("c"), lit(types(c)).as("t"),
      col(s"min_$c").cast("string").as("lo"),
      col(s"max_$c").cast("string").as("hi")))
    val lines = perFile
      .join(org.apache.spark.sql.functions.broadcast(idxDf), Seq("__part"))
      .select(col("__pidx"), col("__rel"), explode(array(lineStructs: _*)).as("s"))
      .filter(col("s.lo").isNotNull && col("s.hi").isNotNull)
      .select(col("__pidx"), concat_ws("\t",
        encCol(col("__rel")), col("s.c"), col("s.t"),
        encCol(col("s.lo")), encCol(col("s.hi"))).as("line"))
    // per-partition target files swap individually (write to a staging
    // dir, then rename each refreshed partition's file into place)
    val staging = new Path(table, "._stats_manifest_refresh.tmp")
    fs.delete(staging, true)
    lines.repartition(col("__pidx"))
      .write.partitionBy("__pidx").text(staging.toString)
    val target = filesDir(table)
    fs.mkdirs(target)
    pidx.foreach { case (part, i) =>
      val src = new Path(staging, s"__pidx=$i")
      if (fs.exists(src)) {
        val texts = fs.listStatus(src).map(_.getPath)
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        val dst = new Path(target, enc(part))
        fs.delete(dst, false)
        if (texts.length == 1) fs.rename(texts.head, dst)
        else {
          val out = fs.create(dst, true)
          try texts.foreach { t =>
            val tin = fs.open(t)
            try {
              val buf = new Array[Byte](1 << 16)
              var n = tin.read(buf)
              while (n > 0) { out.write(buf, 0, n); n = tin.read(buf) }
            } finally tin.close()
          } finally out.close()
        }
      }
    }
    fs.delete(staging, true)

    // republish the parts summary: fresh rows for stale partitions,
    // existing rows for the rest — LAST, so a crash mid-refresh leaves
    // the old (count-mismatched, open-and-keep) behavior, never a
    // summary that claims coverage the files dir doesn't have
    val freshByPart = partRows.map { r =>
      val part = r.getAs[String]("__part")
      val nf = r.getAs[Long]("__nf")
      val fp = java.lang.Long.toHexString(r.getAs[Long]("__fp"))
      val sb = new StringBuilder
      cols.foreach { c =>
        val lo = r.getAs[Any](s"pmin_$c")
        val hi = r.getAs[Any](s"pmax_$c")
        if (lo != null && hi != null)
          sb.append(s"${enc(part)}\t$c\t${types(c)}\t${enc(lo.toString)}" +
            s"\t${enc(hi.toString)}\t$nf\t$fp\n")
      }
      part -> sb.toString
    }.toMap
    val keptLines = rows.filterNot(r => freshByPart.contains(r._1))
      .map(_._5 + "\n") // non-stale lines pass through verbatim
    publishAt(spark, table, partsPath(table), "._stats_manifest_parts.tmp",
      keptLines.mkString + freshByPart.toSeq.sortBy(_._1).map(_._2).mkString)
    stale.size
  }

  /** Two-level prune of an explicit file universe (absolute paths
    * under `table`). See the layout comment above for the per-partition
    * decision table; the returned partsOpened counts how many
    * partitions' per-file stats the prune had to read.
    */
  def filterByStatsPartitioned(spark: SparkSession, table: String,
                               files: Seq[String], column: String,
                               lo: String, hi: String): TwoLevelPrune = {
    val fs = partsPath(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byPart = files.groupBy { f =>
      val rel = relOf(table, f)
      if (rel.contains("/")) rel.substring(0, rel.indexOf('/')) else ""
    }
    if (!fs.exists(partsPath(table)))
      return TwoLevelPrune(files, byPart.size, 0)
    val in = fs.open(partsPath(table))
    val plines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    // 7-field lines carry the partition file-set fingerprint; legacy
    // 6-field lines parse with fp = None and can never drop-whole
    // (the per-file stats are consulted instead — conservative)
    val partStats = plines.flatMap(_.split('\t') match {
      case Array(p, c, tn, mn, mx, nf) if c == column =>
        Some(dec(p) -> ((tn, dec(mn), dec(mx), nf.toLong,
          None: Option[String])))
      case Array(p, c, tn, mn, mx, nf, fp) if c == column =>
        Some(dec(p) -> ((tn, dec(mn), dec(mx), nf.toLong, Some(fp))))
      case _ => None
    }).toMap

    var opened = 0
    val kept = Seq.newBuilder[String]

    def openAndPrune(part: String, pfiles: Seq[String]): Unit = {
      val pf = new Path(filesDir(table), enc(part))
      if (!fs.exists(pf)) { kept ++= pfiles; return }
      opened += 1
      val pin = fs.open(pf)
      val flines = try scala.io.Source.fromInputStream(pin, "UTF-8").getLines().toList
      finally pin.close()
      val stats = flines.flatMap(_.split('\t') match {
        case Array(rel, c, tn, mn, mx) if c == column =>
          Some(dec(rel) -> ((tn, dec(mn), dec(mx))))
        case _ => None
      }).toMap
      pfiles.foreach { f =>
        stats.get(relOf(table, f)) match {
          case Some((tn, mn, mx)) =>
            if (cmp(tn, mx, lo) >= 0 && cmp(tn, mn, hi) <= 0) kept += f
          case None => kept += f // unknown file: keep (stale is safe)
        }
      }
    }

    byPart.foreach { case (part, pfiles) =>
      partStats.get(part) match {
        case None => kept ++= pfiles // unknown partition: keep whole
        case Some((tn, mn, mx, nf, fp)) =>
          val intersects = cmp(tn, mx, lo) >= 0 && cmp(tn, mn, hi) <= 0
          // drop-whole needs count AND file-set fingerprint to match:
          // an equal-count replacement (or a pinned-snapshot universe
          // of coincidentally equal size) would otherwise drop files
          // the summary never described — see fpOf
          val covered = pfiles.size == nf &&
            fp.contains(fpOf(pfiles.map(relOf(table, _))))
          if (intersects) openAndPrune(part, pfiles)
          else if (covered) () // complete coverage: drop whole
          else openAndPrune(part, pfiles) // stale: unknown files survive
      }
    }
    TwoLevelPrune(kept.result(), byPart.size, opened)
  }

  /** Two-level manifest-pruned range read — [[rangeRead]] with the
    * partition-grouped prune. Same exactness contract: the prune is a
    * superset filter and the typed predicate re-applies in full.
    */
  def rangeReadTwoLevel(spark: SparkSession, table: String, column: String,
                        lo: String, hi: String): (DataFrame, TwoLevelPrune) = {
    import org.apache.spark.sql.functions.lit
    val fs = partsPath(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val universe = listDataFiles(spark, fs, table)
    val prune = filterByStatsPartitioned(spark, table, universe, column, lo, hi)
    val base =
      if (prune.files.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          spark.read.parquet(table).schema)
      else spark.read.option("basePath", table).parquet(prune.files: _*)
    val t = base.schema(column).dataType
    (base.filter(col(column) >= lit(lo).cast(t) && col(column) <= lit(hi).cast(t)),
      prune)
  }

  // ----- Bloom membership manifest (point-lookup file skipping) --------

  private def bloomPath(table: String) = new Path(table, "_bloom_manifest")

  private val BloomHashes = 6

  /** Per-file Bloom filters for `cols` — the point-lookup complement to
    * min/max stats: on a column the layout is NOT sorted by, every
    * file's [min, max] spans nearly the full domain and the range
    * prune keeps everything, but membership of one key is still sparse
    * per file. One distributed pass (the statsLines shape: group by
    * input_file_name, constant-size [[graft.expressions.BloomAgg]]
    * buffer per file), `bits/8` bytes of driver metadata per
    * (file, column). False positives keep a file; false negatives
    * can't happen — same never-lose-rows contract as the stats prune.
    */
  def writeBlooms(spark: SparkSession, table: String, cols: Seq[String],
                  bits: Int = 8192): Unit = {
    import org.apache.spark.sql.GraftColumnBridge
    val df = spark.read.parquet(table)
    val types = cols.map(c => c -> df.schema(c).dataType.typeName).toMap
    val bad = cols.filterNot(c => Set("integer", "long", "short", "byte",
      "string").contains(types(c)))
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        "bloom manifest supports integral/string columns only: " +
          bad.map(c => s"$c:${types(c)}").mkString(", "))
    val aggs = cols.map { c =>
      GraftColumnBridge.column(
        graft.expressions.BloomAgg(
          GraftColumnBridge.expression(col(c)), bits, BloomHashes)
          .toAggregateExpression()).as(s"bloom_$c")
    }
    val rows = df.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // one fixed-size filter per (file, column): driver metadata
    val root = new Path(table).toUri.getPath
    val sb = new StringBuilder
    rows.foreach { r =>
      val uri = new java.net.URI(r.getAs[String]("__file")).getPath
      val rel = uri.stripPrefix(root).stripPrefix("/")
      cols.foreach { c =>
        val hex = r.getAs[Array[Byte]](s"bloom_$c")
          .map(b => f"${b & 0xff}%02x").mkString
        sb.append(s"${enc(rel)}\t$c\t$BloomHashes\t$hex\n")
      }
    }
    publishAt(spark, table, bloomPath(table), "._bloom_manifest.tmp",
      sb.toString)
  }

  /** Files that might contain `value` in `column` per the bloom
    * manifest; files without a filter row are conservatively kept.
    */
  def filterByBloom(spark: SparkSession, table: String, files: Seq[String],
                    column: String, value: Any): Seq[String] = {
    val fs = bloomPath(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(bloomPath(table))) return files
    val in = fs.open(bloomPath(table))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    val blooms = lines.flatMap(_.split('\t') match {
      case Array(rel, c, k, hex) if c == column =>
        Some(dec(rel) -> ((k.toInt,
          hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)))
      case _ => None
    }).toMap
    val root = new Path(table).toUri.getPath
    files.filter { f =>
      val rel = f.stripPrefix(root).stripPrefix("/")
      blooms.get(rel) match {
        case Some((k, bytes)) =>
          graft.expressions.BloomAgg.mightContain(bytes, k, value)
        case None => true
      }
    }
  }

  // ----- Two-level (partition-grouped) bloom manifest -------------------
  //
  // The writePartitioned/filterByStatsPartitioned layout applied to
  // point lookups: writeBlooms collects one fixed-size filter per
  // (file, column) on the driver — ~1 KB each is GBs at 10⁶ files —
  // and filterByBloom parses them all per probe. Here the driver keeps
  // only a PARTITION-level bloom union (the OR of the partition's file
  // filters, computed directly as one BloomAgg over the partition's
  // rows — same bit math) plus file counts; per-file filters live in
  // one Spark-written text file per partition, opened only when the
  // partition union says "might contain". Unions need their own
  // capacity: a partition holds many files' keys, so `partBits` should
  // be ~12 bits per PARTITION row where `fileBits` is per-file sized.
  // Same never-lose-rows contract: unknown partitions/files are kept,
  // and a file-count mismatch (late appends) forces the per-file open.

  private def bloomPartsPath(table: String) =
    new Path(table, "_bloom_manifest_parts")
  private def bloomFilesDir(table: String) =
    new Path(table, "_bloom_manifest_files")

  /** Rebuild the two-level bloom manifest for a directory-partitioned
    * table. Two distributed passes (per-file filters, per-partition
    * unions); the driver holds partition-scale state only.
    */
  def writeBloomsPartitioned(spark: SparkSession, table: String,
                             cols: Seq[String], fileBits: Int = 8192,
                             partBits: Int = 131072): Unit = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.functions.{concat_ws, count, expr, hex, lit,
      substring_index, array, struct, explode}
    val df = spark.read.parquet(table)
    val types = cols.map(c => c -> df.schema(c).dataType.typeName).toMap
    val bad = cols.filterNot(c => Set("integer", "long", "short", "byte",
      "string").contains(types(c)))
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        "bloom manifest supports integral/string columns only: " +
          bad.map(c => s"$c:${types(c)}").mkString(", "))
    def agg(c: String, bits: Int) = GraftColumnBridge.column(
      graft.expressions.BloomAgg(
        GraftColumnBridge.expression(col(c)), bits, BloomHashes)
        .toAggregateExpression())
    val rootPath = new Path(table).toUri.getPath

    val fileAggs = cols.map(c => agg(c, fileBits).as(s"bloom_$c"))
    val perFile = df.groupBy(input_file_name().as("__file"))
      .agg(fileAggs.head, fileAggs.tail: _*)
      .withColumn("__rel", relColOf(rootPath))
      .withColumn("__part", substring_index(col("__rel"), "/", 1))
      .localCheckpoint() // consumed twice: file counts + line write

    // partition unions from the DATA at partition capacity (identical
    // bit math to OR-ing the file filters, but correctly sized)
    val partAggs = cols.map(c => agg(c, partBits).as(s"bloom_$c"))
    val partRows = df
      .withColumn("__file", input_file_name())
      .withColumn("__part", substring_index(relColOf(rootPath), "/", 1))
      .groupBy("__part")
      .agg(partAggs.head, partAggs.tail: _*)
      .collect() // ONE filter per partition dir: bounded driver metadata
    val partMeta = perFile.groupBy("__part")
      .agg(count(lit(1)).as("n"), fpAgg.as("fp"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), java.lang.Long.toHexString(r.getLong(2))))).toMap
    val parts = partMeta.keys.toSeq.sorted
    if (parts.exists(p => p == null || p.endsWith(".parquet")))
      throw new IllegalArgumentException(
        "writeBloomsPartitioned needs a directory-partitioned table " +
          "(files directly under the root: use writeBlooms instead)")
    val sb = new StringBuilder
    partRows.foreach { r =>
      val part = r.getAs[String]("__part")
      val (nf, fp) = partMeta(part)
      cols.foreach { c =>
        val hx = r.getAs[Array[Byte]](s"bloom_$c")
          .map(b => f"${b & 0xff}%02x").mkString
        sb.append(s"${enc(part)}\t$c\t$BloomHashes\t$hx\t$nf\t$fp\n")
      }
    }

    val pidx = parts.zipWithIndex.toMap
    val idxDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        pidx.toSeq.map { case (p, i) => org.apache.spark.sql.Row(p, i) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__part",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__pidx",
          org.apache.spark.sql.types.IntegerType))))
    val lineStructs = cols.map(c => struct(
      lit(c).as("c"), hex(col(s"bloom_$c")).as("hx")))
    val lines = perFile
      .join(org.apache.spark.sql.functions.broadcast(idxDf), Seq("__part"))
      .select(col("__pidx"), col("__rel"),
        explode(array(lineStructs: _*)).as("s"))
      .select(col("__pidx"), concat_ws("\t",
        encCol(col("__rel")), col("s.c"), lit(BloomHashes.toString),
        col("s.hx")).as("line"))
    writePerPartLines(spark, table, lines, pidx, bloomFilesDir(table),
      "._bloom_manifest_files.tmp")
    publishAt(spark, table, bloomPartsPath(table),
      "._bloom_manifest_parts.tmp", sb.toString)
  }

  /** Extend the two-level bloom manifest to partitions whose on-disk
    * file SET no longer matches the recorded one — the streaming
    * companion to [[writeBloomsPartitioned]], exactly
    * [[refreshStalePartitions]]' discipline on the bloom layout:
    * re-scans ONLY the stale partitions' files (per-file filters at
    * the layer's recorded file capacity, partition unions from the
    * data at the recorded union capacity — both inferred from the
    * existing manifest's hex widths), rewrites only their per-file
    * filter files, republishes the parts summary last. Stale = count
    * OR fingerprint mismatch, so equal-count replacements refresh
    * too; legacy no-fingerprint lines always read as stale and
    * upgrade in place. Idempotent: a replay sees matching sets and
    * no-ops. Returns the number of refreshed partitions.
    */
  def refreshStaleBloomPartitions(spark: SparkSession, table: String): Int = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.functions.{concat_ws, count, hex, lit,
      substring_index, array, struct, explode}
    val fs = bloomPartsPath(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(bloomPartsPath(table))) return 0
    val in = fs.open(bloomPartsPath(table))
    val plines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    // (part, col, union hex width, nfiles, fp?, raw line)
    val rows = plines.flatMap { l =>
      l.split('\t') match {
        case a if a.length == 5 || a.length == 6 =>
          Some((dec(a(0)), a(1), a(3).length, a(4).toLong,
            if (a.length == 6) Some(a(5)) else None, l))
        case _ => None
      }
    }
    val cols = rows.map(_._2).distinct
    if (cols.isEmpty) return 0
    val partBits = rows.head._3 * 4 // 2 hex chars per byte
    // per-file capacity from any existing per-file line
    val fileBits = {
      val dirs = if (fs.exists(bloomFilesDir(table)))
        fs.listStatus(bloomFilesDir(table)).toSeq else Nil
      dirs.iterator.flatMap { st =>
        val pin = fs.open(st.getPath)
        val ls = try scala.io.Source.fromInputStream(pin, "UTF-8")
          .getLines().take(1).toList finally pin.close()
        ls.flatMap(_.split('\t') match {
          case Array(_, _, _, hx) => Some(hx.length * 4)
          case _ => None
        })
      }.nextOption().getOrElse(partBits / 16 max 64)
    }
    val recorded = rows.groupBy(_._1).view
      .mapValues(h => (h.head._4, h.head._5)).toMap
    val byPart = listDataFiles(spark, fs, table).groupBy { f =>
      val rel = relOf(table, f)
      if (rel.contains("/")) rel.substring(0, rel.indexOf('/')) else ""
    }
    val stale = byPart.filter { case (p, fl) =>
      recorded.get(p) match {
        case Some((nf, fp)) =>
          fl.size != nf || !fp.contains(fpOf(fl.map(relOf(table, _))))
        case None => true
      }
    }
    if (stale.isEmpty) return 0

    def agg(c: String, bits: Int) = GraftColumnBridge.column(
      graft.expressions.BloomAgg(
        GraftColumnBridge.expression(col(c)), bits, BloomHashes)
        .toAggregateExpression())
    val df = spark.read.option("basePath", table)
      .parquet(stale.values.flatten.toSeq: _*)
    val rootPath = new Path(table).toUri.getPath
    val fileAggs = cols.map(c => agg(c, fileBits).as(s"bloom_$c"))
    val perFile = df.groupBy(input_file_name().as("__file"))
      .agg(fileAggs.head, fileAggs.tail: _*)
      .withColumn("__rel", relColOf(rootPath))
      .withColumn("__part", substring_index(col("__rel"), "/", 1))
      .localCheckpoint()
    val partAggs = cols.map(c => agg(c, partBits).as(s"bloom_$c"))
    val partRows = df
      .withColumn("__file", input_file_name())
      .withColumn("__part", substring_index(relColOf(rootPath), "/", 1))
      .groupBy("__part")
      .agg(partAggs.head, partAggs.tail: _*)
      .collect() // stale partitions only: bounded driver metadata
    val partMeta = perFile.groupBy("__part")
      .agg(count(lit(1)).as("n"), fpAgg.as("fp"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), java.lang.Long.toHexString(r.getLong(2))))).toMap

    // rewrite ONLY the stale partitions' per-file filter files
    val parts = partMeta.keys.toSeq.sorted
    val pidx = parts.zipWithIndex.toMap
    val idxDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        pidx.toSeq.map { case (p, i) => org.apache.spark.sql.Row(p, i) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__part",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__pidx",
          org.apache.spark.sql.types.IntegerType))))
    val lineStructs = cols.map(c => struct(
      lit(c).as("c"), hex(col(s"bloom_$c")).as("hx")))
    val lines = perFile
      .join(org.apache.spark.sql.functions.broadcast(idxDf), Seq("__part"))
      .select(col("__pidx"), col("__rel"),
        explode(array(lineStructs: _*)).as("s"))
      .select(col("__pidx"), concat_ws("\t",
        encCol(col("__rel")), col("s.c"), lit(BloomHashes.toString),
        col("s.hx")).as("line"))
    val staging = new Path(table, "._bloom_manifest_refresh.tmp")
    fs.delete(staging, true)
    lines.repartition(col("__pidx"))
      .write.partitionBy("__pidx").text(staging.toString)
    val target = bloomFilesDir(table)
    fs.mkdirs(target)
    pidx.foreach { case (part, i) =>
      val src = new Path(staging, s"__pidx=$i")
      if (fs.exists(src)) {
        val texts = fs.listStatus(src).map(_.getPath)
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        val dst = new Path(target, enc(part))
        fs.delete(dst, false)
        if (texts.length == 1) fs.rename(texts.head, dst)
        else {
          val out = fs.create(dst, true)
          try texts.foreach { t =>
            val tin = fs.open(t)
            try {
              val buf = new Array[Byte](1 << 16)
              var n = tin.read(buf)
              while (n > 0) { out.write(buf, 0, n); n = tin.read(buf) }
            } finally tin.close()
          } finally out.close()
        }
      }
    }
    fs.delete(staging, true)

    // republish the parts summary LAST: fresh rows for stale
    // partitions, raw pass-through for the rest
    val freshByPart = partRows.map { r =>
      val part = r.getAs[String]("__part")
      val (nf, fp) = partMeta(part)
      val sb = new StringBuilder
      cols.foreach { c =>
        val hx = r.getAs[Array[Byte]](s"bloom_$c")
          .map(b => f"${b & 0xff}%02x").mkString
        sb.append(s"${enc(part)}\t$c\t$BloomHashes\t$hx\t$nf\t$fp\n")
      }
      part -> sb.toString
    }.toMap
    val keptLines = rows.filterNot(r => freshByPart.contains(r._1))
      .map(_._6 + "\n")
    publishAt(spark, table, bloomPartsPath(table),
      "._bloom_manifest_parts.tmp",
      keptLines.mkString + freshByPart.toSeq.sortBy(_._1).map(_._2).mkString)
    stale.size
  }

  /** Two-level bloom prune of an explicit file universe: partition
    * unions first, per-file filters only for partitions that might
    * contain `value` (or whose file count no longer matches — late
    * appends are conservatively kept).
    */
  def filterByBloomPartitioned(spark: SparkSession, table: String,
                               files: Seq[String], column: String,
                               value: Any): TwoLevelPrune = {
    val fs = bloomPartsPath(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byPart = files.groupBy { f =>
      val rel = relOf(table, f)
      if (rel.contains("/")) rel.substring(0, rel.indexOf('/')) else ""
    }
    if (!fs.exists(bloomPartsPath(table)))
      return TwoLevelPrune(files, byPart.size, 0)
    val in = fs.open(bloomPartsPath(table))
    val plines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    // 6-field lines carry the partition file-set fingerprint; legacy
    // 5-field lines parse with fp = None and can never drop-whole
    val partBlooms = plines.flatMap(_.split('\t') match {
      case Array(p, c, k, hx, nf) if c == column =>
        Some(dec(p) -> ((k.toInt,
          hx.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
          nf.toLong, None: Option[String])))
      case Array(p, c, k, hx, nf, fp) if c == column =>
        Some(dec(p) -> ((k.toInt,
          hx.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray,
          nf.toLong, Some(fp))))
      case _ => None
    }).toMap

    var opened = 0
    val kept = Seq.newBuilder[String]

    def openAndPrune(part: String, pfiles: Seq[String]): Unit = {
      val pf = new Path(bloomFilesDir(table), enc(part))
      if (!fs.exists(pf)) { kept ++= pfiles; return }
      opened += 1
      val pin = fs.open(pf)
      val flines = try scala.io.Source.fromInputStream(pin, "UTF-8").getLines().toList
      finally pin.close()
      val blooms = flines.flatMap(_.split('\t') match {
        case Array(rel, c, k, hx) if c == column =>
          Some(dec(rel) -> ((k.toInt,
            hx.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)))
        case _ => None
      }).toMap
      pfiles.foreach { f =>
        blooms.get(relOf(table, f)) match {
          case Some((k, bytes)) =>
            if (graft.expressions.BloomAgg.mightContain(bytes, k, value))
              kept += f
          case None => kept += f // unknown file: keep (stale is safe)
        }
      }
    }

    byPart.foreach { case (part, pfiles) =>
      partBlooms.get(part) match {
        case None => kept ++= pfiles
        case Some((k, bytes, nf, fp)) =>
          val might = graft.expressions.BloomAgg.mightContain(bytes, k, value)
          // same drop-whole discipline as the stats prune: count AND
          // file-set fingerprint must both match (see fpOf)
          val covered = pfiles.size == nf &&
            fp.contains(fpOf(pfiles.map(relOf(table, _))))
          if (might) openAndPrune(part, pfiles)
          else if (covered) () // union says no, coverage complete
          else openAndPrune(part, pfiles) // stale: unknown files survive
      }
    }
    TwoLevelPrune(kept.result(), byPart.size, opened)
  }

  /** Two-level bloom-pruned point lookup — [[pointRead]]'s layout-aware
    * sibling: `column = value` planned from partition bloom unions,
    * then per-file filters for surviving partitions, then the exact
    * typed predicate. Works on columns the partition layout is
    * UNCORRELATED with (the min/max bands span everything; membership
    * per partition is still sparse).
    */
  def pointReadTwoLevel(spark: SparkSession, table: String, column: String,
                        value: String): (DataFrame, TwoLevelPrune) = {
    import org.apache.spark.sql.functions.lit
    val fs = bloomPartsPath(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val universe = listDataFiles(spark, fs, table)
    val t = spark.read.parquet(table).schema(column).dataType
    val typed: Any = t.typeName match {
      case "integer" | "long" | "short" | "byte" => value.toLong
      case _ => value
    }
    val prune = filterByBloomPartitioned(spark, table, universe, column, typed)
    val base =
      if (prune.files.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          spark.read.parquet(table).schema)
      else spark.read.option("basePath", table).parquet(prune.files: _*)
    (base.filter(col(column) === lit(value).cast(t)), prune)
  }

  /** Bloom + stats pruned point lookup: `column = value` served by
    * driver-side file skipping, then the exact typed predicate. On a
    * column the files are sorted by, the stats band does the skipping;
    * on any other integral/string column the blooms do — together they
    * cover both layout axes of the "fetch one key out of 100 TB" read.
    */
  def pointRead(spark: SparkSession, table: String, column: String,
                value: String): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val fs = manifestPath(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val universe = listDataFiles(spark, fs, table)
    val byStats = filterByStats(spark, table, universe, column, value, value)
    val t = spark.read.parquet(table).schema(column).dataType
    val typed: Any = t.typeName match {
      case "integer" | "long" | "short" | "byte" => value.toLong
      case _ => value
    }
    val files = filterByBloom(spark, table, byStats, column, typed)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          spark.read.parquet(table).schema)
      else spark.read.option("basePath", table).parquet(files: _*)
    base.filter(col(column) === lit(value).cast(t))
  }

  /** Manifest-pruned range read: scans ONLY intersecting files, then
    * applies the exact predicate typed to the column (the manifest is a
    * superset filter — results are identical to a full scan + filter by
    * construction; the prune spec asserts both).
    */
  def rangeRead(spark: SparkSession, table: String, column: String,
                lo: String, hi: String): DataFrame =
    multiRangeRead(spark, table, Seq((column, lo, hi)))

  /** Conjunctive multi-column range read: a file survives only if its
    * [min, max] intersects EVERY predicate's band — the read shape a
    * z-ordered layout exists to serve (each Morton-curve file is tight
    * on all clustered columns at once, so a 2-D box skips most files
    * where a single-key sort skips on one axis only). Same exactness
    * contract as [[rangeRead]]: the prune is a superset filter and the
    * typed predicates re-apply in full.
    */
  def multiRangeRead(spark: SparkSession, table: String,
                     preds: Seq[(String, String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(preds.nonEmpty)
    // ONE listing, narrowed per predicate over the SAME universe — two
    // independent listings intersected would silently drop a file a
    // concurrent writer commits between them (it appears only in the
    // later listing), violating the never-lose-rows contract that
    // unknown-to-the-manifest files are conservatively kept.
    val fs = manifestPath(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val universe = listDataFiles(spark, fs, table)
    val files = preds.foldLeft(universe) { case (fl, (c, lo, hi)) =>
      filterByStats(spark, table, fl, c, lo, hi)
    }
    // basePath keeps directory-partition columns in the schema when the
    // scan is built from explicit leaf files — without it a partitioned
    // table's pruned read would drop (or fail to resolve) those columns
    // and break the documented full-scan+filter equivalence. The
    // everything-pruned case builds a schema-only empty frame: a
    // limit(0) over the table would still PLAN every file, and a
    // caller's planned-vs-on-disk prune assert would invert exactly
    // when pruning worked best.
    val base =
      if (files.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          spark.read.parquet(table).schema)
      else spark.read.option("basePath", table).parquet(files: _*)
    preds.foldLeft(base) { case (df, (c, lo, hi)) =>
      val t = df.schema(c).dataType
      df.filter(col(c) >= lit(lo).cast(t) && col(c) <= lit(hi).cast(t))
    }
  }
}

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

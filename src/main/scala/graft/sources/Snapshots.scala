package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table snapshots — the time-travel half of the lakehouse
  * layout story (Delta/Iceberg keep the same shape in their logs):
  * every commit writes NEW data files plus one immutable manifest
  * listing exactly the files that make up that version, and readers
  * plan from a manifest, never from the directory listing.
  *
  * Why this matters at 100 TB: a reader that plans from a listing
  * races every writer — a compaction or ingest that swaps files mid
  * query makes the scan see half-old half-new state (or fail on a
  * deleted split). Pinning the file set at plan time gives every
  * reader a consistent snapshot for the query's whole lifetime, lets
  * writers commit freely (files are immutable; old versions remain
  * readable until vacuumed), and makes "what did the table contain
  * when that model trained?" a first-class query instead of an
  * archaeology project.
  *
  * Layout under the table root:
  * `_snapshots/v00000000.manifest` … one line per data file (relative
  * path, percent-encoded like StatsManifest); data files live in
  * per-commit `snap-v{N}-{token}/` directories and are NEVER rewritten
  * — only vacuum deletes, and only files no kept manifest references.
  * Like Delta/Iceberg, the manifest is the source of truth: a plain
  * recursive parquet read of a snapshot table root is undefined (it
  * would union every live version).
  *
  * Concurrency: manifests publish by write-to-temp + rename, so
  * readers see an old or new manifest, never a torn one. Two racing
  * writers to the SAME next version are detected (the loser's rename
  * lands on an existing manifest and fails) — single-writer-per-table
  * is the supported discipline, matching a driver-coordinated
  * pipeline; a crashed commit leaves an unreferenced data directory
  * that is invisible to readers and reclaimed by vacuum.
  */
object Snapshots {

  private def snapDir(table: String) = new Path(table, "_snapshots")

  private def manifestPath(table: String, v: Int) =
    new Path(snapDir(table), f"v$v%08d.manifest")

  private def enc(s: String): String =
    s.flatMap {
      case '%' => "%25"
      case '\n' => "%0A"
      case '\r' => "%0D"
      case '=' => "%3D" // meta lines split on the FIRST '=' — keys must not carry one
      case c => c.toString
    }

  private def dec(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 3 <= s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def fsOf(spark: SparkSession, table: String) =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Parquet files under `dir`, recursively, as `prefix`-relative paths
    * (partitioned commits nest data files in `__p_*=v/` subdirs).
    */
  private def listParquet(fs: org.apache.hadoop.fs.FileSystem,
                          dir: Path, prefix: String): Seq[String] =
    fs.listStatus(dir).toSeq.flatMap { s =>
      val name = s.getPath.getName
      if (s.isDirectory) listParquet(fs, s.getPath, s"$prefix/$name")
      else if (name.endsWith(".parquet")) Seq(s"$prefix/$name")
      else Nil
    }

  /** All committed versions, ascending (empty for a fresh table). */
  def versions(spark: SparkSession, table: String): Seq[Int] = {
    val fs = fsOf(spark, table)
    if (!fs.exists(snapDir(table))) return Nil
    fs.listStatus(snapDir(table)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt }
      .sorted
  }

  def latestVersion(spark: SparkSession, table: String): Option[Int] =
    versions(spark, table).lastOption

  /** Relative data-file paths of `version` (latest when None). */
  def files(spark: SparkSession, table: String,
            version: Option[Int] = None): Seq[String] = {
    val fs = fsOf(spark, table)
    val v = version.orElse(latestVersion(spark, table)).getOrElse(
      throw new IllegalArgumentException(s"no snapshots under $table"))
    val p = manifestPath(table, v)
    require(fs.exists(p), s"snapshot v$v does not exist under $table")
    manifestLines(spark, table, v).filterNot(_.startsWith("#")).map(dec)
  }

  private def manifestLines(spark: SparkSession, table: String, v: Int): List[String] = {
    val fs = fsOf(spark, table)
    val in = fs.open(manifestPath(table, v))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    lines.filter(_.nonEmpty)
  }

  /** Metadata recorded with `version`'s commit (`#key=value` manifest
    * header lines; empty for versions committed without meta).
    */
  def meta(spark: SparkSession, table: String,
           version: Option[Int] = None): Map[String, String] = {
    val v = version.orElse(latestVersion(spark, table)).getOrElse(
      return Map.empty)
    manifestLines(spark, table, v)
      .filter(_.startsWith("#"))
      .flatMap { l =>
        l.drop(1).split("=", 2) match {
          case Array(k, value) => Some(dec(k) -> dec(value))
          case _ => None
        }
      }.toMap
  }

  /** Version whose commit wall-clock is the latest ≤ `tsMillis` — the
    * "AS OF TIMESTAMP" half of time travel (version pinning is the
    * other). Commit times ride the manifest as `committed_at` meta;
    * versions predating that meta (or clock-skewed under the
    * single-writer discipline) are simply never resolved AFTER a
    * later-stamped version, because resolution scans ascending and
    * keeps the last qualifying stamp.
    */
  def versionAsOf(spark: SparkSession, table: String,
                  tsMillis: Long): Option[Int] =
    versions(spark, table).foldLeft(Option.empty[Int]) { (acc, v) =>
      meta(spark, table, Some(v)).get(CommittedAtKey) match {
        case Some(t) if t.toLong <= tsMillis => Some(v)
        case _ => acc
      }
    }

  /** [[read]] pinned to [[versionAsOf]]`(tsMillis)`. */
  def readAsOf(spark: SparkSession, table: String, tsMillis: Long): DataFrame =
    read(spark, table, Some(versionAsOf(spark, table, tsMillis).getOrElse(
      throw new IllegalArgumentException(
        s"no version at or before $tsMillis under $table"))))

  private val CommittedAtKey = "committed_at"

  /** Manifest meta key holding the version's declared schema (DDL
    * string). The DECLARED schema governs reads — files are never
    * footer-merged. Columns added by a later append are null-filled
    * for files that predate them; columns dropped from the declared
    * schema are pruned from older files at scan time; and time travel
    * reads each version under the schema it was committed with
    * (Iceberg's schema-on-read-from-the-log semantics, not Spark's
    * mergeSchema footer crawl — at 100 TB a footer crawl over a
    * million files is a job in itself).
    */
  private val SchemaKey = "schema"

  /** Parquet reader pinned to `version`'s declared schema (plain
    * reader for pre-evolution tables with no schema meta).
    */
  private def readerFor(spark: SparkSession, table: String,
                        version: Option[Int]) =
    meta(spark, table, version).get(SchemaKey) match {
      case Some(ddl) =>
        spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
      case None => spark.read
    }

  /** Commit `df` as the next version. `overwrite` replaces the table's
    * contents; `append` carries the previous version's files forward
    * unchanged (an append commit rewrites ZERO existing bytes — the
    * new manifest just references them). Returns the committed
    * version number. Every commit records its wall-clock as
    * `committed_at` meta (caller-supplied meta wins on collision —
    * tests pin synthetic clocks through exactly that override).
    */
  def commit(spark: SparkSession, table: String, df: DataFrame,
             mode: String = "overwrite",
             withMeta: Map[String, String] = Map.empty,
             base: Option[Int] = None,
             partitionBy: Seq[(String, String)] = Nil): Int = {
    require(mode == "overwrite" || mode == "append", s"bad mode $mode")
    val fs = fsOf(spark, table)
    // `base` (default: the global latest) is the version an append
    // carries files from — named refs (sources.Refs) commit onto their
    // branch head while version NUMBERS stay one global sequence, the
    // Iceberg shape (snapshots are global; refs are pointers into them)
    val prev = base.orElse(latestVersion(spark, table))
    // version NUMBERS always advance the global sequence, even when the
    // carry base is an older (branch-head) version
    val next = latestVersion(spark, table).map(_ + 1).getOrElse(0)
    val token = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = f"snap-v$next%08d-$token"
    // hidden partitioning: each (transform, srcCol) pair becomes a
    // derived `__p_*` column that exists ONLY in the path — the source
    // column stays in the data files, so the layout never leaks into
    // query semantics and later commits are free to use a DIFFERENT
    // spec (partition evolution; see PartitionSpec)
    if (partitionBy.isEmpty) df.write.parquet(s"$table/$dataDir")
    else {
      val derived = partitionBy.foldLeft(df) { case (acc, (t, c)) =>
        acc.withColumn(PartitionSpec.fieldName(t, c), PartitionSpec.column(t, c))
      }
      derived.write
        .partitionBy(partitionBy.map { case (t, c) => PartitionSpec.fieldName(t, c) }: _*)
        .parquet(s"$table/$dataDir")
    }
    val newFiles = listParquet(fs, new Path(table, dataDir), dataDir)
    require(newFiles.nonEmpty, "refusing to commit an empty snapshot")
    val carried =
      if (mode == "append" && prev.nonEmpty) files(spark, table, prev) else Nil
    // schema evolution guard: pending merge-on-read deltas were written
    // under the OLD schema; evolving over them would break the merged
    // read's unionByName — fold the log first
    if (carried.exists(_.startsWith("delta-v"))) {
      val prior = prev.flatMap(p => meta(spark, table, Some(p)).get(SchemaKey))
      require(prior.forall(_ == df.schema.toDDL),
        "schema change over pending merge-on-read deltas: run " +
          "compactDeltas before evolving the schema")
    }
    publishManifest(spark, table, next, carried ++ newFiles,
      withMeta + (SchemaKey -> df.schema.toDDL))
    next
  }

  /** Write + atomically publish the manifest for `v` listing `relFiles`
    * with `withMeta` header lines. Shared by [[commit]] and
    * [[commitDelta]].
    */
  private def publishManifest(spark: SparkSession, table: String, v: Int,
                              relFiles: Seq[String],
                              withMeta: Map[String, String]): Unit = {
    val fs = fsOf(spark, table)
    val token = java.util.UUID.randomUUID().toString.take(8)
    // every publish path (commit, delta, compaction) stamps its commit
    // wall-clock for AS-OF-TIMESTAMP resolution. Caller meta wins so
    // tests can pin synthetic clocks; the carry-forward paths all strip
    // the previous stamp first, so a new commit never masquerades as
    // its predecessor's time
    val stamped =
      if (withMeta.contains(CommittedAtKey)) withMeta
      else withMeta + (CommittedAtKey -> System.currentTimeMillis().toString)
    val header = stamped.toSeq.sortBy(_._1)
      .map { case (k, value) => s"#${enc(k)}=${enc(value)}" }
    val content =
      (header ++ relFiles.map(enc)).mkString("", "\n", "\n")
    val tmp = new Path(snapDir(table), f".v$v%08d.tmp-$token")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    // publish onto a FRESH path. On local filesystems Hadoop's rename
    // is POSIX rename(2), which silently OVERWRITES an existing
    // destination — an exists() pre-check is a TOCTOU race, so for
    // file:// we publish via link(2) (atomic create-exclusive of a
    // fully-written file) and let EEXIST name the losing writer.
    // Non-local filesystems (HDFS and kin) reject rename-onto-existing
    // themselves.
    val target = manifestPath(table, v)
    val won =
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(target.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else !fs.exists(target) && fs.rename(tmp, target)
    fs.delete(tmp, false)
    if (!won)
      throw new java.io.IOException(
        s"snapshot v$v already committed under $table (concurrent writer)")
  }

  /** Read `version` (latest when None) as a DataFrame whose file set is
    * pinned NOW — concurrent later commits or vacuums of OTHER
    * versions cannot change what this plan reads.
    *
    * MERGE-ON-READ aware: when the pinned file set carries
    * [[commitDelta]] delta files, the read applies them transparently —
    * per key, the highest delta version wins over lower deltas and the
    * base; winners flagged deleted are dropped. Callers never see the
    * layout detail (diff/merge/compact all route through here), exactly
    * like Iceberg/Delta readers hide their delete files. Plan shape:
    * the base pays one anti-join against the delta key set — broadcast
    * while deltas are small (their whole point), so the base is neither
    * shuffled nor rewritten until [[compactDeltas]] folds the log.
    */
  def read(spark: SparkSession, table: String,
           version: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, row_number}
    val rel = files(spark, table, version)
    val (deltaRel, baseRel) = rel.partition(_.startsWith("delta-v"))
    val base =
      if (baseRel.isEmpty) {
        require(deltaRel.isEmpty, s"delta files with no base under $table")
        throw new IllegalArgumentException(s"empty snapshot under $table")
      } else readBase(spark, table, version, baseRel)
    if (deltaRel.isEmpty) return base
    val keys = meta(spark, table, version).getOrElse("mor.keys",
      throw new IllegalStateException(
        s"delta files but no mor.keys meta under $table")).split(',').toSeq
    // one frame per delta version, stamped with its version for the
    // last-writer-wins resolution
    val deltas = deltaRel.groupBy(f => f.takeWhile(_ != '/')).toSeq
      .map { case (dir, fs) =>
        val v = dir.stripPrefix("delta-v").takeWhile(_.isDigit).toInt
        spark.read.parquet(fs.map(f => s"$table/$f"): _*)
          .withColumn("__v", lit(v))
      }
      .reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("__v").desc)
    val winners = deltas
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    base.join(winners.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(
        winners.filter(!col("__del")).drop("__del", "__v", "__rn"))
  }

  /** Scan an arbitrary mix of flat and hidden-partitioned base files as
    * ONE frame under the version's declared schema. Flat files read
    * through the declared-schema reader directly; partitioned files are
    * grouped per data directory (each group reads under its OWN
    * `basePath`, so Spark reconstitutes that directory's `__p_*`
    * layout regardless of what any other commit used — this is what
    * makes the partition spec evolvable), the derived `__p_*` columns
    * are dropped, and the group is aligned to the declared schema
    * (missing columns null-fill, dropped columns prune, same rules the
    * flat path gets from the schema'd reader).
    */
  private def readBase(spark: SparkSession, table: String,
                       version: Option[Int], baseRel: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (partRel, flatRel) =
      baseRel.partition(_.contains("/" + PartitionSpec.Prefix))
    val declared = meta(spark, table, version).get(SchemaKey)
      .map(org.apache.spark.sql.types.StructType.fromDDL)
    def align(df: DataFrame): DataFrame = declared match {
      case Some(st) => df.select(st.fields.toSeq.map(f =>
        if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType).as(f.name)): _*)
      case None => df
    }
    val flat =
      if (flatRel.isEmpty) Nil
      else Seq(readerFor(spark, table, version)
        .parquet(flatRel.map(f => s"$table/$f"): _*))
    val part = partRel.groupBy(_.takeWhile(_ != '/')).toSeq.sortBy(_._1)
      .map { case (dir, fsq) =>
        val raw = spark.read.option("basePath", s"$table/$dir")
          .parquet(fsq.map(f => s"$table/$f"): _*)
        align(raw.drop(raw.columns.filter(_.startsWith(PartitionSpec.Prefix)).toSeq: _*))
      }
    (flat ++ part).reduce(_ unionByName _)
  }

  /** Read ONLY the data files `version` added relative to `base` —
    * the staged bytes of one commit, at cost proportional to the
    * change, never the table. This is what a Write-Audit-Publish
    * audit must validate: re-evaluating the input DataFrame would
    * recompute its source plan, and with a non-deterministic source
    * (or data changing between stage and audit) the published bytes
    * would differ from the audited ones. Added MOR delta files are
    * refused — WAP stages whole batches as base commits.
    */
  def readAdded(spark: SparkSession, table: String,
                version: Int, base: Int): DataFrame = {
    val prev = files(spark, table, Some(base)).toSet
    val added = files(spark, table, Some(version)).filterNot(prev)
    require(!added.exists(_.startsWith("delta-v")),
      s"version $version added MOR delta files — readAdded audits base commits")
    if (added.isEmpty) read(spark, table, Some(version)).limit(0)
    else readBase(spark, table, Some(version), added)
  }

  /** MERGE-ON-READ commit: write ONLY the change set as a delta file
    * group and carry every previous file forward — bytes written are
    * proportional to the CHANGE, not the table (the 100 TB write-side
    * story; [[merge]] is the copy-on-write alternative that rewrites
    * the table for read-side purity). Source rows upsert by `keyCols`;
    * rows flagged true in `deleteCol` delete. Readers apply the delta
    * log transparently ([[read]]) until [[compactDeltas]] folds it.
    * Within one delta batch keys must be unique (enforced — the
    * resolution orders across versions, not within one). Returns the
    * new version.
    */
  def commitDelta(spark: SparkSession, table: String, source: DataFrame,
                  keyCols: Seq[String],
                  deleteCol: Option[String] = None,
                  extraMeta: Map[String, String] = Map.empty): Int = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val fs = fsOf(spark, table)
    val prev = latestVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"commitDelta needs an existing table under $table"))
    val prevMeta = meta(spark, table, Some(prev))
    prevMeta.get("mor.keys").foreach(k =>
      require(k == keyCols.mkString(","),
        s"pending deltas use keys [$k], got [${keyCols.mkString(",")}]"))
    // withColumnRenamed, not withColumn+drop: when the caller's flag is
    // already named __del, the latter would drop the flag entirely
    val normalized = deleteCol
      .map(c => source.withColumnRenamed(c, "__del"))
      .getOrElse(source.withColumn("__del", lit(false)))
    val dup = normalized.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).count()
    require(dup == 0, s"$dup duplicate keys within one delta batch")
    // the merged read unions delta payloads with the base by name — a
    // source that drops or invents columns must fail at WRITE time, not
    // in some later reader's plan
    val tableCols = read(spark, table, Some(prev)).columns.toSet
    val srcCols = normalized.drop("__del").columns.toSet
    require(srcCols == tableCols,
      s"delta columns $srcCols must match table columns $tableCols")
    val next = prev + 1
    val token = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = f"delta-v$next%08d-$token"
    normalized.write.parquet(s"$table/$dataDir")
    val newFiles = fs.listStatus(new Path(table, dataDir)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .map(n => s"$dataDir/$n")
    require(newFiles.nonEmpty, "refusing to commit an empty delta")
    val carried = files(spark, table, Some(prev))
    val withMeta =
      (prevMeta - CommittedAtKey) ++ extraMeta +
        ("mor.keys" -> keyCols.mkString(","))
    publishManifest(spark, table, next, carried ++ newFiles, withMeta)
    next
  }

  /** Fold the pending delta log into a full base version (major
    * compaction): materializes the merged view as a fresh snap commit,
    * so reads drop the anti-join and range/stats pruning applies again.
    * Prior versions — including the delta manifests — stay readable
    * until vacuumed. No-op (returns the current version) when no
    * deltas are pending.
    */
  def compactDeltas(spark: SparkSession, table: String): Int = {
    val v = latestVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no snapshots under $table"))
    if (!files(spark, table, Some(v)).exists(_.startsWith("delta-v"))) return v
    commit(spark, table, read(spark, table), "overwrite",
      withMeta = meta(spark, table) - "mor.keys" - CommittedAtKey)
  }

  /** Manifest-pruned range read of a snapshot VERSION: the version
    * pins WHICH files exist, [[StatsManifest.filterByStats]] drops the
    * pinned files whose [min,max] can't intersect — time travel and
    * driver-side skipping compose. Maintain the manifest with
    * `StatsManifest.appendMissing(table)` after commits (it covers
    * every version's immutable files, so pruned reads work at ANY
    * version); without it the read degrades to the full pinned set,
    * never to wrong rows.
    */
  def rangeRead(spark: SparkSession, table: String, column: String,
                lo: String, hi: String,
                version: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val rel = files(spark, table, version)
    // pending merge-on-read deltas override base rows, so a file-pruned
    // scan of the raw set would be WRONG (a pruned-in base row may be
    // deleted/updated by a delta): degrade to the correct filter over
    // the merged view until compactDeltas restores pruned reads
    if (rel.exists(_.startsWith("delta-v"))) {
      val merged = read(spark, table, version)
      val t = merged.schema(column).dataType
      return merged.filter(
        col(column) >= lit(lo).cast(t) && col(column) <= lit(hi).cast(t))
    }
    // two independent driver-side pruners compose: flat files drop by
    // their stats-manifest [min,max]; hidden-partitioned files drop by
    // their OWN path-declared transform (PartitionSpec.mayContain) —
    // correct under partition evolution because each file is judged
    // under the spec it was written with. Both are conservative
    // (unknown → keep), so the read degrades, never lies.
    val (partRel, flatRel) = rel.partition(_.contains("/" + PartitionSpec.Prefix))
    val keptFlat = StatsManifest
      .filterByStats(spark, table, flatRel.map(f => s"$table/$f"), column, lo, hi)
      .map(_.stripPrefix(s"$table/"))
    val keptPart = partRel.filter(PartitionSpec.mayContain(_, column, lo, hi))
    val kept = keptFlat ++ keptPart
    val base =
      if (kept.isEmpty) read(spark, table, version).limit(0)
      else readBase(spark, table, version, kept)
    val t = base.schema(column).dataType
    base.filter(col(column) >= lit(lo).cast(t) && col(column) <= lit(hi).cast(t))
  }

  /** Change-data feed between two snapshot versions: one row per
    * inserted / deleted / updated key, keyed by `keyCols`, with the row
    * payload taken from the NEW version for insert/update and the OLD
    * version for delete, plus a `change_type` column. This is the
    * "what happened to the table between v_a and v_b" primitive that
    * downstream incremental consumers (rollup refresh, cache
    * invalidation, CDC export) read instead of re-scanning the table.
    *
    * Shape: one full-outer equi-join on the key columns (both sides
    * hash-partitioned on the same key — a single co-partitioned
    * shuffle), null-safe value comparison for update detection,
    * unchanged keys filtered out. Versions are immutable file sets, so
    * the diff is reproducible forever regardless of later commits.
    */
  def diff(spark: SparkSession, table: String, fromV: Int, toV: Int,
           keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    val wide = diffWide(spark, table, fromV, toV, keyCols)
    val valCols = read(spark, table, Some(toV)).columns
      .filterNot(keyCols.contains).toSeq
    wide.select(
      keyCols.map(col) ++
        valCols.map(c =>
          when(col("change_type") === "delete", col(s"old_$c"))
            .otherwise(col(s"new_$c")).as(c)) :+
        col("change_type"): _*)
  }

  /** [[diff]] with BOTH sides' payloads: `old_<c>` / `new_<c>` per
    * value column (nulls on the absent side of inserts/deletes). This
    * is the feed incremental view maintenance needs — an update's old
    * values retract its previous contribution while the new values add
    * the next one, so a downstream aggregate can be patched from the
    * delta alone, never re-scanning the table (gated end to end by
    * qj13).
    */
  def diffWide(spark: SparkSession, table: String, fromV: Int, toV: Int,
               keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, when}
    val o = read(spark, table, Some(fromV)).as("o")
    val n = read(spark, table, Some(toV)).as("n")
    val valCols = n.columns.filterNot(keyCols.contains).toSeq
    val cond = keyCols.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val oKey = col(s"o.${keyCols.head}")
    val nKey = col(s"n.${keyCols.head}")
    val changed = valCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, cond, "full_outer")
      .withColumn("change_type",
        when(oKey.isNull, lit("insert"))
          .when(nKey.isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(
        keyCols.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++
          valCols.map(c => col(s"o.$c").as(s"old_$c")) ++
          valCols.map(c => col(s"n.$c").as(s"new_$c")) :+
          col("change_type"): _*)
  }

  /** Delta-style MERGE committed as a new version: source rows upsert
    * by key (replace the current row or insert), rows flagged true in
    * `deleteCol` delete instead. One anti-join on the source key set
    * plus a union — the standard distributed upsert shape (both sides
    * hash-partitioned on the key). Returns the new version.
    */
  def merge(spark: SparkSession, table: String, source: DataFrame,
            keyCols: Seq[String], deleteCol: Option[String] = None,
            autoEvolve: Boolean = false): Int = {
    import org.apache.spark.sql.functions.col
    val cur = read(spark, table)
    val upserts = deleteCol
      .map(c => source.filter(!col(c)).drop(c)).getOrElse(source)
    if (!autoEvolve)
      require(upserts.columns.toSet == cur.columns.toSet,
        s"merge source columns ${upserts.columns.toSet} must match table " +
          s"columns ${cur.columns.toSet}; pass autoEvolve = true to widen " +
          "the declared schema (added columns null-fill existing rows)")
    val touched = deleteCol
      .map(c => source.drop(c)).getOrElse(source)
      .select(keyCols.map(col): _*).distinct()
    val keep = cur.join(touched, keyCols, "left_anti")
    // allowMissingColumns widens in BOTH directions: a source column
    // the table lacks evolves the schema (kept rows null-fill), and a
    // table column the source lacks null-fills the upserts — the
    // standard MERGE WITH SCHEMA EVOLUTION contract. The commit stamps
    // the widened schema, so later reads and time travel behave per
    // the declared-schema rules.
    commit(spark, table,
      keep.unionByName(upserts, allowMissingColumns = autoEvolve))
  }

  /** Compact the LATEST version into ~`targetBytes` files, committed as
    * a new version — maintenance composed with time travel: the
    * rewrite reads the pinned old file set and writes a brand-new data
    * directory, so readers of every prior version (including the one
    * being compacted) are untouched; the old layout stays readable
    * until vacuumed. This is how small-file cleanup runs CONTINUOUSLY
    * against a table under live readers at 100 TB — the non-snapshot
    * `Maintenance.compact` swap, by contrast, requires a quiesced
    * table. Returns the new version.
    */
  def compact(spark: SparkSession, table: String,
              targetBytes: Long): Int = {
    val fs = fsOf(spark, table)
    val fsz = files(spark, table, None)
      .map(f => fs.getFileStatus(new Path(table, f)).getLen).sum
    val n = math.max(1, math.ceil(fsz.toDouble / targetBytes).toInt)
    // maintenance must not erase durable table properties — e.g. the
    // exactly-once ingest guard's applied batch id — so the compacted
    // version carries the previous version's meta forward verbatim
    commit(spark, table, read(spark, table).repartition(n), "overwrite",
      withMeta = meta(spark, table) - CommittedAtKey)
  }

  /** INCREMENTAL compaction: rewrite ONLY the dirty files (smaller than
    * `targetBytes`/2) into ~`targetBytes` files and carry every
    * compliant file forward BY REFERENCE — the new manifest lists old
    * clean files + new compacted files, so maintenance cost is
    * proportional to the small-file debt, never the table (at 100 TB,
    * full-table `compact` is a non-starter once the table is mostly
    * well-laid-out; continuous ingest only ever dirties the tail).
    * Crash-safe for free: files are immutable and readers plan from
    * manifests, so a crashed run leaves an unreferenced data dir for
    * vacuum, exactly like any commit. No-ops (returns the current
    * version) when fewer than two files are dirty. Refuses a table
    * with pending merge-on-read deltas — fold them first
    * ([[compactDeltas]]); silently compacting half a delta log would
    * break the version-ordered resolution.
    */
  def compactIncremental(spark: SparkSession, table: String,
                         targetBytes: Long): Int = {
    val fs = fsOf(spark, table)
    val v = latestVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no snapshots under $table"))
    val rel = files(spark, table, Some(v))
    require(!rel.exists(_.startsWith("delta-v")),
      "pending merge-on-read deltas: run compactDeltas before " +
        "compactIncremental")
    val sized = rel.map(f =>
      f -> fs.getFileStatus(new Path(table, f)).getLen)
    val (dirty, clean) = sized.partition(_._2 < targetBytes / 2)
    if (dirty.size <= 1) return v
    val dirtyBytes = dirty.map(_._2).sum
    val nOut = math.max(1, math.ceil(dirtyBytes.toDouble / targetBytes).toInt)
    val next = v + 1
    val token = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = f"snap-v$next%08d-$token"
    readerFor(spark, table, Some(v))
      .parquet(dirty.map { case (f, _) => s"$table/$f" }: _*)
      .repartition(nOut)
      .write.parquet(s"$table/$dataDir")
    val newFiles = fs.listStatus(new Path(table, dataDir)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .map(n => s"$dataDir/$n")
    publishManifest(spark, table, next,
      clean.map(_._1) ++ newFiles,
      meta(spark, table, Some(v)) - CommittedAtKey)
    next
  }

  /** Table history as a DataFrame — one row per version with commit
    * time, file/byte counts, and whether it is the current head
    * (Delta's DESCRIBE HISTORY shape). Driver-side metadata only: the
    * manifests ARE the history, no data files are touched.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, table)
    val vs = versions(spark, table)
    val head = vs.lastOption
    vs.map { v =>
      val rel = files(spark, table, Some(v))
      val bytes = rel.map(f => fs.getFileStatus(new Path(table, f)).getLen).sum
      val m = meta(spark, table, Some(v))
      (v, m.get(CommittedAtKey).map(_.toLong),
        rel.size.toLong, bytes, rel.count(_.startsWith("delta-v")).toLong,
        head.contains(v))
    }.toDF("version", "committed_at_ms", "n_files", "n_bytes",
      "n_delta_files", "is_current")
  }

  /** Roll the table back to `version` — committed as a NEW head whose
    * manifest re-references the old version's files verbatim (Delta
    * RESTORE): zero bytes copied, the bad versions stay readable for
    * forensics until vacuumed, and the rollback itself is one more
    * auditable commit rather than history rewriting. Returns the new
    * version number.
    */
  def restore(spark: SparkSession, table: String, version: Int): Int = {
    val vs = versions(spark, table)
    require(vs.contains(version), s"version $version does not exist under $table")
    val next = vs.last + 1
    publishManifest(spark, table, next,
      files(spark, table, Some(version)),
      meta(spark, table, Some(version)) - CommittedAtKey)
    next
  }

  /** Delete all but the last `keepLast` versions and every data file no
    * kept manifest references (including orphans from crashed
    * commits). Readers of kept versions are unaffected — their files
    * are all referenced.
    */
  def vacuum(spark: SparkSession, table: String, keepLast: Int = 2): Int = {
    require(keepLast >= 1, "must keep at least one version")
    val fs = fsOf(spark, table)
    val vs = versions(spark, table)
    // named refs (branches/tags) pin their target versions: a vacuum
    // must never delete a version a ref still points to, no matter how
    // old — exactly Iceberg's ref-retention rule
    val pinned = Refs.all(spark, table).values.toSet
    val (drop, keep0) = vs.splitAt(math.max(0, vs.length - keepLast))
    val keep = (keep0 ++ drop.filter(pinned)).sorted
    val referenced = keep.flatMap(v => files(spark, table, Some(v))).toSet
    var removed = 0
    // data dirs are the unit of deletion: a dir with no referenced file
    // (crashed commit, or only-dropped-version data) goes entirely;
    // merge-on-read delta dirs are data dirs like any other
    fs.listStatus(new Path(table)).toSeq
      .filter(s => s.isDirectory && (s.getPath.getName.startsWith("snap-v") ||
        s.getPath.getName.startsWith("delta-v")))
      .foreach { d =>
        val dir = d.getPath.getName
        val live = referenced.exists(_.startsWith(dir + "/"))
        if (!live) {
          // recursive count — partitioned commits nest their files
          removed += listParquet(fs, d.getPath, dir).size
          fs.delete(d.getPath, true)
        } else {
          // referenced dirs may still hold individually-dead files —
          // recursively, so dead files nested in hidden-partition
          // `__p_*=v/` subdirectories are reclaimed too (direct-child
          // listing leaked them forever)
          listParquet(fs, d.getPath, dir)
            .filterNot(referenced.contains)
            .foreach { rel =>
              fs.delete(new Path(table, rel), false); removed += 1
            }
        }
      }
    drop.filterNot(pinned)
      .foreach(v => fs.delete(manifestPath(table, v), false))
    removed
  }
}

package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named refs over the snapshot log — Iceberg's branch/tag model:
  * versions form ONE global, immutable commit sequence
  * ([[Snapshots]]); a ref is a named pointer into it. A BRANCH ref
  * moves when committed to (each branch commit carries files from the
  * branch HEAD, not the global latest, so branches are isolated); a
  * TAG is immutable. [[Snapshots.vacuum]] never deletes a version a
  * ref pins, no matter how old.
  *
  * Ref files are one version number under `<table>/_refs/`. Tag
  * creation publishes create-exclusive (link(2), EEXIST names the
  * losing writer — the manifest-publish discipline); branch updates
  * replace atomically (java.nio ATOMIC_MOVE on local filesystems,
  * FileContext overwriting rename elsewhere, so readers never observe
  * a missing ref — ref updates are last-writer-wins by design,
  * version history itself is conflict-safe either way).
  */
object Refs {

  private def refsDir(table: String) = new Path(table, "_refs")

  private def refPath(table: String, name: String) = {
    require(name.matches("[A-Za-z0-9._-]+"), s"bad ref name '$name'")
    new Path(refsDir(table), s"$name.ref")
  }

  private def fsOf(spark: SparkSession, table: String) =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeRef(spark: SparkSession, table: String, name: String,
                       version: Int, kind: String,
                       createOnly: Boolean): Unit = {
    val fs = fsOf(spark, table)
    fs.mkdirs(refsDir(table))
    val target = refPath(table, name)
    if (createOnly && fs.exists(target))
      throw new java.io.IOException(s"ref '$name' already exists under $table")
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(refsDir(table), s".$name.tmp-$token")
    val out = fs.create(tmp, true)
    try out.write(s"$kind $version\n".getBytes("UTF-8")) finally out.close()
    if (createOnly && fs.getScheme == "file") {
      try java.nio.file.Files.createLink(
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        fs.delete(tmp, false)
        throw new java.io.IOException(s"ref '$name' already exists under $table")
      }
      fs.delete(tmp, false)
    } else if (fs.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      // one-step overwriting rename (FileContext + Rename.OVERWRITE):
      // delete-then-rename leaves a window with NO ref file, so a
      // concurrent resolve/read would throw `no ref` spuriously —
      // this keeps ref updates last-writer-wins without ever exposing
      // a missing ref to readers on HDFS-like stores
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        fs.getUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(fs.makeQualified(tmp), fs.makeQualified(target),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  private def readRef(spark: SparkSession, table: String,
                      name: String): (String, Int) = {
    val fs = fsOf(spark, table)
    val p = refPath(table, name)
    require(fs.exists(p), s"no ref '$name' under $table")
    val in = fs.open(p)
    val content =
      try new String(in.readAllBytes(), "UTF-8").trim
      finally in.close()
    content.split(" ") match {
      case Array(kind, v) => (kind, v.toInt)
      case _ => throw new IllegalStateException(s"corrupt ref '$name': $content")
    }
  }

  /** Create a branch at `at` (default: the global latest version). */
  def branch(spark: SparkSession, table: String, name: String,
             at: Option[Int] = None): Int = {
    val v = at.orElse(Snapshots.latestVersion(spark, table)).getOrElse(
      throw new IllegalArgumentException(s"no snapshots under $table"))
    writeRef(spark, table, name, v, "branch", createOnly = true)
    v
  }

  /** Create an immutable tag at `at` (default: the global latest). */
  def tag(spark: SparkSession, table: String, name: String,
          at: Option[Int] = None): Int = {
    val v = at.orElse(Snapshots.latestVersion(spark, table)).getOrElse(
      throw new IllegalArgumentException(s"no snapshots under $table"))
    writeRef(spark, table, name, v, "tag", createOnly = true)
    v
  }

  /** The version a ref points at. */
  def resolve(spark: SparkSession, table: String, name: String): Int =
    readRef(spark, table, name)._2

  /** All refs: name → pinned version. */
  def all(spark: SparkSession, table: String): Map[String, Int] = {
    val fs = fsOf(spark, table)
    if (!fs.exists(refsDir(table))) return Map.empty
    fs.listStatus(refsDir(table)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.endsWith(".ref") && !n.startsWith(".") =>
        val name = n.stripSuffix(".ref")
        name -> readRef(spark, table, name)._2
      }.toMap
  }

  /** Read the snapshot a ref points at. */
  def read(spark: SparkSession, table: String, name: String): DataFrame =
    Snapshots.read(spark, table, Some(resolve(spark, table, name)))

  /** Commit onto a BRANCH: the new version carries files from the
    * branch head (not the global latest), then the ref advances.
    * Returns the new version.
    */
  def commitTo(spark: SparkSession, table: String, name: String,
               df: DataFrame, mode: String = "overwrite"): Int = {
    val (kind, head) = readRef(spark, table, name)
    require(kind == "branch", s"ref '$name' is a $kind — tags are immutable")
    val v = Snapshots.commit(spark, table, df, mode, base = Some(head))
    writeRef(spark, table, name, v, "branch", createOnly = false)
    v
  }

  /** Point `name` at the version another ref resolves to (merge by
    * fast-forward — version history is immutable, so adopting the
    * other branch's head IS the merge).
    */
  def fastForward(spark: SparkSession, table: String, name: String,
                  to: String): Int = {
    val (kind, _) = readRef(spark, table, name)
    require(kind == "branch", s"ref '$name' is a $kind — tags are immutable")
    val v = resolve(spark, table, to)
    writeRef(spark, table, name, v, "branch", createOnly = false)
    v
  }

  /** Drop a ref (the versions it pinned become vacuum-eligible). */
  def drop(spark: SparkSession, table: String, name: String): Unit = {
    val fs = fsOf(spark, table)
    fs.delete(refPath(table, name), false)
    ()
  }
}

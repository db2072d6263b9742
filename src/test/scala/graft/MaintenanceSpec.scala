package graft

import org.apache.spark.sql.functions._

import graft.operators.Maintenance

/** Small-file compaction: content-identical, layout-preserving, fewer
  * files — and the partition pruning built on the layout still works.
  */
class MaintenanceSpec extends SparkSpec {

  private def dataFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  test("compaction merges small files, preserves content and partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val events = Tables(spark, sfDir, "events")
    // accrete many small files per partition (streaming-ingest shape)
    events.repartition(16)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val before = dataFiles(dir).size
    val want = events.orderBy("event_id").collect().toSeq

    Maintenance.compact(spark, dir, partitionCols = Seq("event_type"))

    val after = dataFiles(dir).size
    assert(after < before,
      s"expected fewer files after compaction, got $before -> $after")
    val got = spark.read.parquet(dir)
      .select(events.columns.map(col): _*) // partition col back in place
      .orderBy("event_id").collect().toSeq
    assert(got == want, "compaction must not change content")

    // pruning still works on the compacted layout
    val pruned = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
    pruned.collect()
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: ["))
  }

  test("sorted compaction yields files with disjoint key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    val orders = Tables(spark, sfDir, "orders")
    orders.repartition(8).write.mode("overwrite").parquet(dir)
    // force a multi-file layout so disjointness is non-trivial
    Maintenance.compact(spark, dir, targetBytes = 8L << 10,
      sortCols = Seq("o_orderkey"))
    val files = dataFiles(dir)
    assert(files.size > 1, "need several files to prove range layout")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_orderkey"), max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file key ranges overlap: $ranges")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() == orders.count())
  }

  test("deleteWhere rewrites only affected partitions and drops emptied ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft-delete").toString
    val events = Tables(spark, sfDir, "events")
    events.write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val untouched = dataFiles(dir)
      .filter(_.getPath.contains("event_type=purchase"))
      .map(f => f.getPath -> f.lastModified()).toMap
    assert(untouched.nonEmpty)

    // surgical delete: a user slice inside ONE partition
    val nClickBefore = events.filter(col("event_type") === "click").count()
    val nHit = events.filter(col("event_type") === "click" &&
      col("user_id") % 10 === 0).count()
    assert(nHit > 0)
    Maintenance.deleteWhere(spark, dir, Seq("event_type"),
      col("event_type") === "click" && col("user_id") % 10 === 0)
    val after = spark.read.parquet(dir)
    assert(after.filter(col("event_type") === "click").count() ==
      nClickBefore - nHit)
    assert(after.filter(col("event_type") === "click" &&
      col("user_id") % 10 === 0).count() == 0)
    // untouched partitions: same files, same mtimes — never rewritten
    val untouchedAfter = dataFiles(dir)
      .filter(_.getPath.contains("event_type=purchase"))
      .map(f => f.getPath -> f.lastModified()).toMap
    assert(untouchedAfter == untouched,
      "unaffected partitions must not be read or rewritten")

    // emptying delete: the whole 'view' partition disappears
    Maintenance.deleteWhere(spark, dir, Seq("event_type"),
      col("event_type") === "view")
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName == "event_type=view"),
      "an emptied partition's directory must be dropped")
    assert(spark.read.parquet(dir)
      .filter(col("event_type") === "view").count() == 0)
  }

  test("compaction of an unpartitioned table coalesces to the byte target") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact1").toString
    val nation = Tables(spark, sfDir, "nation")
    nation.repartition(8).write.mode("overwrite").parquet(dir)
    assert(dataFiles(dir).size > 1)
    val n = Maintenance.compact(spark, dir) // tiny table -> 1 file
    assert(n == 1 && dataFiles(dir).size == 1)
    assert(spark.read.parquet(dir).count() == nation.count())
  }
}

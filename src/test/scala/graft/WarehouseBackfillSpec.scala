package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.refstar.Warehouse

/** Incremental backfill (round-7 verdict item 4): rebuilding ONE fact
  * year must (a) reproduce exactly the content the full build wrote —
  * the recipe is shared — and (b) leave every other year's files and
  * all dimension tables byte-untouched (same paths, same mtimes), so a
  * one-year correction at 100 TB costs one year of compute and I/O.
  */
class WarehouseBackfillSpec extends SparkSpec {

  private def files(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filterNot(_.getName.startsWith("_"))
      .map(f => f.getPath -> f.lastModified()).toMap
  }

  test("single-year backfill: identical content, untouched years and dims") {
    val tmp = Files.createTempDirectory("graft-wh-backfill").toString
    sys.props("graft.warehouse.dir") = tmp
    try {
      Warehouse.rebuild(spark)
      val factPath = s"$tmp/fact_salesactual"
      val before = spark.read.parquet(factPath).orderBy("SalesDetailID")
        .collect().toSeq
      val rows2013 = spark.read.parquet(factPath)
        .filter(col(Warehouse.FactYearCol) === 2013).count()
      val untouchedYear = files(s"$factPath/SaleYear=2014")
      val dims = Warehouse.DimTables.map(d => d -> files(s"$tmp/$d")).toMap
      assert(untouchedYear.nonEmpty && rows2013 > 0)

      val written = Warehouse.rebuildPartitions(spark, Seq(2013))

      assert(written == rows2013,
        s"backfill must rewrite exactly the 2013 rows: $written vs $rows2013")
      assert(files(s"$factPath/SaleYear=2014") == untouchedYear,
        "untouched years must keep the same files and mtimes")
      dims.foreach { case (d, fs) =>
        assert(files(s"$tmp/$d") == fs, s"dim $d must not be rewritten")
      }
      val after = spark.read.parquet(factPath).orderBy("SalesDetailID")
        .collect().toSeq
      assert(after == before,
        "a backfill from unchanged staging must reproduce identical content")
    } finally {
      sys.props.remove("graft.warehouse.dir")
      Warehouse.invalidateMemo()
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.{CsvStageReader, StarSchema}
import graft.runner.EtlRunner

class EtlSpec extends SparkSpec {

  test("CSV stage reader: NULL_IF variants, empty fields, corrupt rows") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "channel.csv")
    Files.writeString(f.toPath,
      """CHANNELID,CHANNEL,NOTES
        |1,Online,ok
        |2,NULL,null
        |3,Retail,
        |not-an-int,Broken,row
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("CHANNELID", IntegerType),
      StructField("CHANNEL", StringType),
      StructField("NOTES", StringType)))
    val loaded = CsvStageReader.read(spark, f.getAbsolutePath, schema)
    assert(loaded.errorRows == 1) // ON_ERROR=CONTINUE accounting
    val rows = loaded.df.orderBy("CHANNELID").collect()
    assert(rows.length == 3)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2)) // NULL + null tokens
    assert(rows(2).isNullAt(2)) // empty field as null
    assert(CsvStageReader.stageHasFiles(spark, f.getAbsolutePath))
    assert(!CsvStageReader.stageHasFiles(spark, new java.io.File(dir, "missing*.csv").getAbsolutePath))
  }

  test("CSV stage reader loads through a non-default FileSystem scheme") {
    // the reference's stages are cloud URIs (abfss://...,
    // rahil/create_stages.py:33-49); the reader must resolve the
    // FileSystem from the URI scheme, not assume the local default.
    // graftfs:// is a local-backed stand-in registered via
    // fs.graftfs.impl — the same resolution path a cloud connector uses.
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val dir = Files.createTempDirectory("graft-csv-fs").toFile
    val f = new java.io.File(dir, "channel.csv")
    Files.writeString(f.toPath,
      """CHANNELID,CHANNEL
        |1,Online
        |2,Retail
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("CHANNELID", IntegerType),
      StructField("CHANNEL", StringType)))
    val uri = s"graftfs://${f.getAbsolutePath}"
    assert(CsvStageReader.stageHasFiles(spark, uri))
    assert(!CsvStageReader.stageHasFiles(
      spark, s"graftfs://${dir.getAbsolutePath}/missing*.csv"))
    val loaded = CsvStageReader.read(spark, uri, schema)
    assert(loaded.errorRows == 0)
    assert(loaded.df.orderBy("CHANNELID").collect()
      .map(_.getString(1)).toSeq == Seq("Online", "Retail"))
  }

  test("source timestamp parser handles both observed formats") {
    import spark.implicits._
    val df = Seq("1/1/13 20:54", "2013-01-01 21:20:22", "garbage").toDF("s")
      .select(CsvStageReader.parseSourceTimestamp(col("s")).as("ts"))
    val rows = df.collect()
    assert(rows(0).getTimestamp(0).toString == "2013-01-01 20:54:00.0")
    assert(rows(1).getTimestamp(0).toString == "2013-01-01 21:20:22.0")
    assert(rows(2).isNullAt(0))
  }

  test("dimensions: unknown member at key 1, dense keys, no collisions") {
    val dim = StarSchema.dimCustomer(spark, sfDir)
    val n = Tables(spark, sfDir, "customer").count()
    assert(dim.count() == n + 1)
    assert(dim.filter(col("dim_customer_key") === 1)
      .head().getAs[String]("customer_name") == "Unknown")
    assert(dim.select("dim_customer_key").distinct().count() == n + 1)
    assert(dim.agg(max("dim_customer_key")).head().getLong(0) == n + 1)
  }

  test("fact preserves row count and resolves every FK") {
    val dimC = StarSchema.dimCustomer(spark, sfDir)
    val dimS = StarSchema.dimSupplier(spark, sfDir)
    val fact = StarSchema.factSales(spark, sfDir, dimC, dimS)
    assert(fact.count() == Tables(spark, sfDir, "lineitem").count())
    assert(fact.filter(col("dim_customer_key").isNull ||
      col("dim_supplier_key").isNull).count() == 0)
    // referential integrity: every fact key exists in the dim
    val orphans = fact.join(dimC, Seq("dim_customer_key"), "left_anti")
    assert(orphans.count() == 0)
  }

  test("EtlRunner sequences all steps green and registers views") {
    val results = EtlRunner.run(spark, sfDir)
    assert(results.nonEmpty && results.forall(_.ok),
      results.filterNot(_.ok).mkString(", "))
    assert(spark.table("vw_sales_by_nation").count() > 0)
    assert(spark.table("vw_sales_by_month").count() > 0)
  }
}

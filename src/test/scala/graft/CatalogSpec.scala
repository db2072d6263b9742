package graft

/** Catalog introspection (the reference's SHOW/DESCRIBE verification
  * loop, SURVEY.md §2.1 S9): after the ETL runner registers the star,
  * the catalog must list the views and expose their schemas.
  */
class CatalogSpec extends SparkSpec {

  test("runner-registered views are introspectable through the catalog") {
    graft.runner.EtlRunner.run(spark, sfDir)
    val names = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Set("etl_dim_date", "etl_dim_customer", "etl_dim_supplier",
      "etl_fact_sales",
      "vw_sales_by_nation", "vw_sales_by_month").subsetOf(names), names)
    val factCols = spark.table("etl_fact_sales").schema.fieldNames.toSet
    assert(Set("dim_customer_key", "dim_supplier_key", "dim_order_date_key",
      "revenue", "charge").subsetOf(factCols))
    assert(spark.catalog.listDatabases().count() >= 1)
  }
}

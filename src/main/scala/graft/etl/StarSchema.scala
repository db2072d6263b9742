package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.Tables

/** Star-schema ETL over the test tables, re-expressing the reference's
  * dimensional phase (rahil/run_dimensional_etl.py) Spark-first:
  * dimensions carry dense surrogate keys with an Unknown member at key
  * 1 (rahil/create_dimension_tables.py:91-130), facts resolve foreign
  * keys through COALESCE-normalized left-join lookups with fallback to
  * the Unknown member (rahil/load_dimension_tables.py:152-163), and
  * derived measures are computed at load (SaleUnitPrice-style,
  * DIMENSION_README.md:147-148).
  *
  * Scale posture: only genuinely bounded dims (nation/region — fixed
  * cardinality at any SF) carry broadcast hints. dimCustomer/dimSupplier
  * grow with data volume, so their fact lookups carry no hint: AQE
  * broadcasts them at runtime while they measure small and falls back to
  * shuffle joins when they don't. The big shuffle is lineitem ⋈ orders,
  * co-partitioned on orderkey. Facts never get row_number keys (dims
  * only).
  */
object StarSchema {

  /** Customer dimension: customer ⋈ nation ⋈ region with null-tolerant
    * normalized lookup + Unknown member (surrogate key 1).
    */
  def dimCustomer(spark: SparkSession, dir: String): DataFrame = {
    val norm = (c: org.apache.spark.sql.Column) =>
      coalesce(c.cast(StringType), lit("?"))
    val base = Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")),
        norm(col("c_nationkey")) === norm(col("n_nationkey")), "left")
      .join(broadcast(Tables(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"), "left")
      .select(
        col("c_custkey").as("customer_bk"),
        col("c_name").as("customer_name"),
        coalesce(col("n_name"), lit("Unknown")).as("nation_name"),
        coalesce(col("r_name"), lit("Unknown")).as("region_name"),
        coalesce(col("c_mktsegment"), lit("Unknown")).as("segment"))
    SurrogateKeys.withUnknownMember(
      spark, base, "dim_customer_key", orderCol = "customer_bk",
      unknown = Map("customer_bk" -> -1L, "customer_name" -> "Unknown",
        "nation_name" -> "Unknown", "region_name" -> "Unknown",
        "segment" -> "Unknown"))
  }

  /** Supplier dimension (same pattern). */
  def dimSupplier(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"), "left")
      .select(
        col("s_suppkey").as("supplier_bk"),
        col("s_name").as("supplier_name"),
        coalesce(col("n_name"), lit("Unknown")).as("nation_name"))
    SurrogateKeys.withUnknownMember(
      spark, base, "dim_supplier_key", orderCol = "supplier_bk",
      unknown = Map("supplier_bk" -> -1L, "supplier_name" -> "Unknown",
        "nation_name" -> "Unknown"))
  }

  /** Date dimension spanning the orders/lineitem date range. */
  def dimDate(spark: SparkSession): DataFrame =
    DateDim.build(spark, "1995-01-01", "2001-12-31")

  /** Sales fact: lineitem ⋈ orders (the big co-partitioned shuffle) with
    * broadcast dim-key lookups, Unknown fallback, derived measures.
    */
  def factSales(spark: SparkSession, dir: String,
                dimCust: DataFrame, dimSupp: DataFrame): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(dimCust.select("dim_customer_key", "customer_bk"),
        col("o_custkey") === col("customer_bk"), "left")
      .join(dimSupp.select("dim_supplier_key", "supplier_bk"),
        col("l_suppkey") === col("supplier_bk"), "left")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(col("dim_customer_key"), lit(1L)).as("dim_customer_key"),
        coalesce(col("dim_supplier_key"), lit(1L)).as("dim_supplier_key"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast(LongType)
          .as("dim_order_date_key"),
        col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("charge"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.refstar.{Fixtures, RefStar, Staging}

/** The reference-entity star at reference shape: golden row counts per
  * BASELINE.md (dims 14/6/4/5/7/21 + 730 dates, facts 187320/48/22),
  * surrogate-key invariants, unknown-member fallbacks, and the composite
  * location lookup. The value-level gate is qr01–qr10 vs the DuckDB
  * oracle (RefStarSql); this spec pins the structural contract.
  */
class RefStarSpec extends SparkSpec {

  private lazy val dimLoc = RefStar.dimLocation(spark)

  test("staging entities load with declared schemas and golden counts") {
    val expected = Map(
      "channel" -> 5L, "channelcategory" -> 2L, "customer" -> 3L,
      "product" -> 20L, "productcategory" -> 4L, "producttype" -> 10L,
      "reseller" -> 4L, "salesdetail" -> 187320L, "salesheader" -> 187320L,
      "store" -> 6L, "targetdatachannel" -> 22L, "targetdataproduct" -> 48L)
    expected.foreach { case (entity, n) =>
      val df = Staging.load(spark, entity)
      assert(df.schema == Staging.schemas(entity), s"schema drift: $entity")
      assert(df.count() == n, s"row count: $entity")
    }
  }

  test("dimensions have golden counts and a single unknown member at key 1") {
    val dims = Seq(
      ("DimLocationID", dimLoc, 14L),
      ("DimChannelID", RefStar.dimChannel(spark), 6L),
      ("DimCustomerID", RefStar.dimCustomer(spark, dimLoc), 4L),
      ("DimResellerID", RefStar.dimReseller(spark, dimLoc), 5L),
      ("DimStoreID", RefStar.dimStore(spark, dimLoc), 7L),
      ("DimProductID", RefStar.dimProduct(spark), 21L))
    dims.foreach { case (key, df, n) =>
      assert(df.count() == n, s"$key count")
      // surrogate keys are 1..n dense, 1 = unknown member
      val keys = df.select(col(key).cast("long")).orderBy(key)
        .collect().map(_.getLong(0)).toSeq
      assert(keys == (1L to n), s"$key density")
    }
    assert(RefStar.dimDate(spark).count() == 730)
  }

  test("store 3's null postal code still resolves a real location key") {
    val store = RefStar.dimStore(spark, dimLoc)
    val s3 = store.filter(col("StoreID") === 3).collect().head
    val loc = s3.getLong(s3.fieldIndex("DimLocationID"))
    assert(loc != 1L, "NULL postal must COALESCE into the composite lookup, not fall back to unknown")
    val locRow = dimLoc.filter(col("DimLocationID") === loc).collect().head
    assert(locRow.getString(locRow.fieldIndex("PostalCode")) == "Unknown")
  }

  test("fact_salesactual: golden count, no null keys, measures consistent") {
    val f = RefStar.factSalesActual(spark)
    assert(f.count() == Fixtures.SalesRows)
    val agg = f.agg(
      sum(when(col("DimProductID").isNull || col("DimStoreID").isNull ||
        col("DimCustomerID").isNull || col("DimResellerID").isNull ||
        col("DimChannelID").isNull || col("DimLocationID").isNull ||
        col("DimSaleDateID").isNull, 1).otherwise(0)).as("nulls"),
      sum(when(col("DimSaleDateID") < 20130101L ||
        col("DimSaleDateID") > 20141231L, 1).otherwise(0)).as("bad_dates"),
      max(abs(col("SaleTotalProfit") -
        (col("SaleAmount") - col("SaleExtendedCost")))).as("profit_drift"),
      sum(when(col("DimStoreID") === 1L && col("DimResellerID") === 1L &&
        col("DimCustomerID") === 1L, 1).otherwise(0)).as("all_unknown"))
      .collect().head
    assert(agg.getLong(0) == 0, "null dim keys")
    assert(agg.getLong(1) == 0, "date keys outside fixture range")
    assert(agg.getDouble(2) == 0.0, "profit identity")
    // every sale has exactly one of store/customer/reseller ⇒ never all-unknown
    assert(agg.getLong(3) == 0, "sale with no party")
  }

  test("target facts: golden counts and unknown fallbacks where expected") {
    val pt = RefStar.factProductSalesTarget(spark, RefStar.dimProduct(spark))
    assert(pt.count() == 48)
    // 4 ghost products × 2 years fall back to the unknown product
    assert(pt.filter(col("DimProductID") === 1L).count() == 8)

    val st = RefStar.factSrcSalesTarget(spark,
      RefStar.dimStore(spark, dimLoc), RefStar.dimReseller(spark, dimLoc),
      RefStar.dimChannel(spark))
    assert(st.count() == 22)
    // 'Indiana Department Store' and 'Acme Webshop' (×2 years) match
    // neither stores nor resellers → both fallbacks at once
    assert(st.filter(col("DimStoreID") === 1L && col("DimResellerID") === 1L)
      .count() == 4)
    // every channel name in the target file exists → channel never unknown
    assert(st.filter(col("DimChannelID") === 1L).count() == 0)
  }
}

package graft.refstar

import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

/** DuckDB oracle SQL for the reference-entity star: one WITH-prefix that
  * rebuilds the 12 staging reads, 7 dimensions and 3 facts exactly as
  * `RefStar` does, so every qr/qv gate query is `WITH <star> SELECT …`.
  *
  * Engine-portability invariants (see the Exact scaladoc):
  *  - staging reads declare the same schemas as `Staging.schemas` and the
  *    same NULL_IF tokens ('NULL','null','') as CsvStageReader
  *  - surrogate keys are row_number()+1 over the identical ORDER BY the
  *    Spark side uses (SurrogateKeys.withUnknownMemberOrdered)
  *  - every per-row arithmetic expression is written in the same
  *    operation order as the DataFrame code, so IEEE doubles agree bit
  *    for bit; aggregate sums go through DECIMAL(25,6) on both sides
  *
  * DuckDB leaves unreferenced CTEs unevaluated, so sharing the full star
  * prefix across all oracles costs nothing per query.
  */
object RefStarSql {

  private def ddbType(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE"
    case _ => "VARCHAR"
  }

  private def stageCte(entity: String): String = {
    val schema: StructType = Staging.schemas(entity)
    val cols = schema.fields
      .map(f => s"'${f.name}': '${ddbType(f.dataType)}'").mkString(", ")
    s"""stg_$entity AS (
       |  SELECT * FROM read_csv('${Fixtures.path(entity)}', header=true,
       |    nullstr=['NULL','null',''], columns={$cols}))""".stripMargin
  }

  /** COALESCE-to-'Unknown' of one staging address column set. */
  private def locBranch(t: String): String =
    s"""SELECT ADDRESS, CITY, POSTALCODE, STATEPROVINCE, COUNTRY
       |FROM stg_$t
       |WHERE ADDRESS IS NOT NULL AND CITY IS NOT NULL AND COUNTRY IS NOT NULL""".stripMargin

  private val dimLocation =
    s"""dim_location AS (
       |  SELECT CAST(1 AS BIGINT) AS DimLocationID, 'Unknown' AS Address,
       |         'Unknown' AS City, 'Unknown' AS PostalCode,
       |         'Unknown' AS State_Province, 'Unknown' AS Country
       |  UNION ALL
       |  SELECT CAST(row_number() OVER (ORDER BY Address, City, PostalCode,
       |           State_Province, Country) + 1 AS BIGINT),
       |         Address, City, PostalCode, State_Province, Country
       |  FROM (
       |    SELECT DISTINCT
       |      COALESCE(ADDRESS, 'Unknown') AS Address,
       |      COALESCE(CITY, 'Unknown') AS City,
       |      COALESCE(CAST(POSTALCODE AS VARCHAR), 'Unknown') AS PostalCode,
       |      COALESCE(STATEPROVINCE, 'Unknown') AS State_Province,
       |      COALESCE(COUNTRY, 'Unknown') AS Country
       |    FROM (${locBranch("customer")}
       |          UNION ALL ${locBranch("store")}
       |          UNION ALL ${locBranch("reseller")})))""".stripMargin

  /** The 5-column composite location lookup (RefStar.withLocationKey). */
  private def locJoin(a: String): String =
    s"""LEFT JOIN dim_location l
       |  ON COALESCE($a.ADDRESS, 'Unknown') = l.Address
       | AND COALESCE($a.CITY, 'Unknown') = l.City
       | AND COALESCE(CAST($a.POSTALCODE AS VARCHAR), 'Unknown') = l.PostalCode
       | AND COALESCE($a.STATEPROVINCE, 'Unknown') = l.State_Province
       | AND COALESCE($a.COUNTRY, 'Unknown') = l.Country""".stripMargin

  private val dimChannel =
    s"""dim_channel AS (
       |  SELECT CAST(1 AS BIGINT) AS DimChannelID, CAST(-1 AS BIGINT) AS ChannelID,
       |         CAST(-1 AS BIGINT) AS ChannelCategoryID,
       |         'Unknown Channel' AS ChannelName, 'Unknown' AS ChannelCategory
       |  UNION ALL
       |  SELECT CAST(row_number() OVER (ORDER BY ChannelID) + 1 AS BIGINT),
       |         ChannelID, ChannelCategoryID, ChannelName, ChannelCategory
       |  FROM (
       |    SELECT c.CHANNELID AS ChannelID,
       |           c.CHANNELCATEGORYID AS ChannelCategoryID,
       |           COALESCE(c.CHANNEL, 'Unknown') AS ChannelName,
       |           COALESCE(cc.CHANNELCATEGORY, 'Unknown') AS ChannelCategory
       |    FROM stg_channel c
       |    JOIN stg_channelcategory cc ON c.CHANNELCATEGORYID = cc.CHANNELCATEGORYID
       |    WHERE c.CHANNEL IS NOT NULL))""".stripMargin

  private val dimCustomer =
    s"""dim_customer AS (
       |  SELECT CAST(1 AS BIGINT) AS DimCustomerID, 'UNKNOWN' AS CustomerID,
       |         CAST(1 AS BIGINT) AS DimLocationID,
       |         'Unknown Customer' AS CustomerFullName,
       |         'Unknown' AS CustomerFirstName, 'Unknown' AS CustomerLastName,
       |         'Unknown' AS CustomerGender
       |  UNION ALL
       |  SELECT CAST(row_number() OVER (ORDER BY CustomerID) + 1 AS BIGINT),
       |         CustomerID, DimLocationID, CustomerFullName,
       |         CustomerFirstName, CustomerLastName, CustomerGender
       |  FROM (
       |    SELECT cu.CUSTOMERID AS CustomerID,
       |           COALESCE(l.DimLocationID, CAST(1 AS BIGINT)) AS DimLocationID,
       |           COALESCE(cu.FIRSTNAME, 'Unknown') || ' ' ||
       |             COALESCE(cu.LASTNAME, 'Unknown') AS CustomerFullName,
       |           COALESCE(cu.FIRSTNAME, 'Unknown') AS CustomerFirstName,
       |           COALESCE(cu.LASTNAME, 'Unknown') AS CustomerLastName,
       |           COALESCE(cu.GENDER, 'Unknown') AS CustomerGender
       |    FROM stg_customer cu
       |    ${locJoin("cu")}
       |    WHERE cu.CUSTOMERID IS NOT NULL))""".stripMargin

  private val dimReseller =
    s"""dim_reseller AS (
       |  SELECT CAST(1 AS BIGINT) AS DimResellerID, 'UNKNOWN' AS ResellerID,
       |         CAST(1 AS BIGINT) AS DimLocationID,
       |         'Unknown Reseller' AS ResellerName, 'Unknown' AS ContactName,
       |         'Unknown' AS PhoneNumber, 'Unknown' AS Email
       |  UNION ALL
       |  SELECT CAST(row_number() OVER (ORDER BY ResellerID) + 1 AS BIGINT),
       |         ResellerID, DimLocationID, ResellerName, ContactName,
       |         PhoneNumber, Email
       |  FROM (
       |    SELECT re.RESELLERID AS ResellerID,
       |           COALESCE(l.DimLocationID, CAST(1 AS BIGINT)) AS DimLocationID,
       |           COALESCE(re.RESELLERNAME, 'Unknown') AS ResellerName,
       |           COALESCE(re.CONTACT, 'Unknown') AS ContactName,
       |           COALESCE(re.PHONENUMBER, 'Unknown') AS PhoneNumber,
       |           COALESCE(re.EMAILADDRESS, 'Unknown') AS Email
       |    FROM stg_reseller re
       |    ${locJoin("re")}
       |    WHERE re.RESELLERID IS NOT NULL))""".stripMargin

  private val dimStore =
    s"""dim_store AS (
       |  SELECT CAST(1 AS BIGINT) AS DimStoreID, CAST(-1 AS BIGINT) AS StoreID,
       |         CAST(1 AS BIGINT) AS DimLocationID, CAST(-1 AS BIGINT) AS SourceStoreID,
       |         'Unknown Store' AS StoreName, 'Unknown' AS StoreNumber,
       |         'Unknown' AS StoreManager
       |  UNION ALL
       |  SELECT CAST(row_number() OVER (ORDER BY StoreID) + 1 AS BIGINT),
       |         StoreID, DimLocationID, SourceStoreID, StoreName, StoreNumber,
       |         StoreManager
       |  FROM (
       |    SELECT st.STOREID AS StoreID,
       |           COALESCE(l.DimLocationID, CAST(1 AS BIGINT)) AS DimLocationID,
       |           st.STOREID AS SourceStoreID,
       |           'Store ' || COALESCE(st.STORENUMBER, 'Unknown') AS StoreName,
       |           COALESCE(CAST(st.STORENUMBER AS VARCHAR), 'Unknown') AS StoreNumber,
       |           COALESCE(st.STOREMANAGER, 'Unknown') AS StoreManager
       |    FROM stg_store st
       |    ${locJoin("st")}
       |    WHERE st.STOREID IS NOT NULL))""".stripMargin

  // margin arithmetic written in RefStar.dimProduct's exact op order
  private val dimProduct =
    s"""dim_product AS (
       |  SELECT CAST(1 AS BIGINT) AS DimProductID, CAST(-1 AS BIGINT) AS ProductID,
       |         CAST(-1 AS BIGINT) AS ProductTypeID, CAST(-1 AS BIGINT) AS ProductCategoryID,
       |         'Unknown Product' AS ProductName, 'Unknown' AS ProductType,
       |         'Unknown' AS ProductCategory,
       |         0.0 AS ProductRetailPrice, 0.0 AS ProductWholesalePrice,
       |         0.0 AS ProductCost, 0.0 AS ProductRetailProfit,
       |         0.0 AS ProductWholesaleUnitProfit,
       |         0.0 AS ProductProfitMarginUnitPercent
       |  UNION ALL
       |  SELECT CAST(row_number() OVER (ORDER BY ProductID) + 1 AS BIGINT),
       |         ProductID, ProductTypeID, ProductCategoryID, ProductName,
       |         ProductType, ProductCategory, ProductRetailPrice,
       |         ProductWholesalePrice, ProductCost, ProductRetailProfit,
       |         ProductWholesaleUnitProfit, ProductProfitMarginUnitPercent
       |  FROM (
       |    SELECT p.PRODUCTID AS ProductID,
       |           p.PRODUCTTYPEID AS ProductTypeID,
       |           pt.PRODUCTCATEGORYID AS ProductCategoryID,
       |           COALESCE(p.PRODUCT, 'Unknown') AS ProductName,
       |           COALESCE(pt.PRODUCTTYPE, 'Unknown') AS ProductType,
       |           COALESCE(pc.PRODUCTCATEGORY, 'Unknown') AS ProductCategory,
       |           COALESCE(p.PRICE, 0.0) AS ProductRetailPrice,
       |           COALESCE(p.WHOLESALEPRICE, 0.0) AS ProductWholesalePrice,
       |           COALESCE(p.COST, 0.0) AS ProductCost,
       |           COALESCE(p.PRICE, 0.0) - COALESCE(p.COST, 0.0) AS ProductRetailProfit,
       |           COALESCE(p.WHOLESALEPRICE, 0.0) - COALESCE(p.COST, 0.0)
       |             AS ProductWholesaleUnitProfit,
       |           CASE WHEN COALESCE(p.PRICE, 0.0) = 0.0 THEN 0.0
       |                ELSE (COALESCE(p.PRICE, 0.0) - COALESCE(p.COST, 0.0))
       |                     / COALESCE(p.PRICE, 1.0) * 100.0
       |           END AS ProductProfitMarginUnitPercent
       |    FROM stg_product p
       |    JOIN stg_producttype pt ON p.PRODUCTTYPEID = pt.PRODUCTTYPEID
       |    JOIN stg_productcategory pc ON pt.PRODUCTCATEGORYID = pc.PRODUCTCATEGORYID
       |    WHERE p.PRODUCTID IS NOT NULL))""".stripMargin

  /** The reference's 34-column calendar: graft.etl.DateDim's oracle with
    * the reference column spelling (matches RefStar.dimDate).
    */
  val dimDateSelect: String =
    s"""SELECT date_pkey AS DATE_PKEY, "date" AS DATE,
       |  full_date_desc AS FULL_DATE_DESC, day_num_in_week AS DAY_NUM_IN_WEEK,
       |  day_num_in_month AS DAY_NUM_IN_MONTH, day_num_in_year AS DAY_NUM_IN_YEAR,
       |  day_name AS DAY_NAME, day_abbrev AS DAY_ABBREV,
       |  weekday_ind AS WEEKDAY_IND, holiday_ind AS US_HOLIDAY_IND,
       |  month_end_ind AS MONTH_END_IND,
       |  week_begin_date_nkey AS WEEK_BEGIN_DATE_NKEY,
       |  week_begin_date AS WEEK_BEGIN_DATE,
       |  week_end_date_nkey AS WEEK_END_DATE_NKEY, week_end_date AS WEEK_END_DATE,
       |  week_num_in_year AS WEEK_NUM_IN_YEAR, month_name AS MONTH_NAME,
       |  month_abbrev AS MONTH_ABBREV, month_num_in_year AS MONTH_NUM_IN_YEAR,
       |  year_month AS YEARMONTH, quarter AS QUARTER, yearquarter AS YEARQUARTER,
       |  "year" AS YEAR, fiscal_week_num AS FISCAL_WEEK_NUM,
       |  fiscal_month_num AS FISCAL_MONTH_NUM, fiscal_year_month AS FISCAL_YEARMONTH,
       |  fiscal_quarter AS FISCAL_QUARTER, fiscal_yearquarter AS FISCAL_YEARQUARTER,
       |  fiscal_halfyear AS FISCAL_HALFYEAR, fiscal_year AS FISCAL_YEAR,
       |  sql_timestamp AS SQL_TIMESTAMP, current_row_ind AS CURRENT_ROW_IND,
       |  effective_date AS EFFECTIVE_DATE, expiration_date AS EXPIRATION_DATE
       |FROM (INNER_SQL)""".stripMargin
      // interpolated after stripMargin: the inner oracle has continuation
      // lines starting with '||' that a second stripMargin would corrupt
      .replace("INNER_SQL", graft.etl.DateDim.oracleSql())

  private val dimDate = s"dim_date AS ($dimDateSelect)"

  /** Source date → yyyyMMdd via the same structural branch arithmetic as
    * RefStar.dateKey (M/d/yy slash-split, else yyyy-MM-dd substrings).
    */
  private def dateKey(c: String): String =
    s"""(CASE WHEN contains($c, '/')
       |  THEN (CAST(str_split($c, '/')[3] AS BIGINT) + 2000) * 10000 +
       |    CAST(str_split($c, '/')[1] AS BIGINT) * 100 +
       |    CAST(str_split($c, '/')[2] AS BIGINT)
       |  ELSE CAST(substr($c, 1, 4) AS BIGINT) * 10000 +
       |    CAST(substr($c, 6, 2) AS BIGINT) * 100 +
       |    CAST(substr($c, 9, 2) AS BIGINT)
       |END)""".stripMargin

  private val factSalesActual =
    s"""fact_salesactual AS (
       |  SELECT COALESCE(p.DimProductID, CAST(1 AS BIGINT)) AS DimProductID,
       |         COALESCE(s.DimStoreID, CAST(1 AS BIGINT)) AS DimStoreID,
       |         COALESCE(r.DimResellerID, CAST(1 AS BIGINT)) AS DimResellerID,
       |         COALESCE(c.DimCustomerID, CAST(1 AS BIGINT)) AS DimCustomerID,
       |         COALESCE(ch.DimChannelID, CAST(1 AS BIGINT)) AS DimChannelID,
       |         ${dateKey("h.DATE")} AS DimSaleDateID,
       |         COALESCE(s.DimLocationID, r.DimLocationID, c.DimLocationID,
       |           CAST(1 AS BIGINT)) AS DimLocationID,
       |         d.SALESHEADERID AS SalesHeaderID,
       |         d.SALESDETAILID AS SalesDetailID,
       |         d.SALESAMOUNT AS SaleAmount,
       |         d.SALESQUANTITY AS SaleQuantity,
       |         d.SALESAMOUNT / d.SALESQUANTITY AS SaleUnitPrice,
       |         d.SALESQUANTITY * COALESCE(p.ProductCost, 0.0) AS SaleExtendedCost,
       |         d.SALESAMOUNT - d.SALESQUANTITY * COALESCE(p.ProductCost, 0.0)
       |           AS SaleTotalProfit
       |  FROM stg_salesdetail d
       |  JOIN stg_salesheader h ON d.SALESHEADERID = h.SALESHEADERID
       |  LEFT JOIN dim_product p ON d.PRODUCTID = p.ProductID
       |  LEFT JOIN dim_store s ON h.STOREID = s.StoreID
       |  LEFT JOIN dim_customer c ON h.CUSTOMERID = c.CustomerID
       |  LEFT JOIN dim_reseller r ON h.RESELLERID = r.ResellerID
       |  LEFT JOIN dim_channel ch ON h.CHANNELID = ch.ChannelID)""".stripMargin

  private val factProductSalesTarget =
    s"""fact_productsalestarget AS (
       |  SELECT COALESCE(p.DimProductID, CAST(1 AS BIGINT)) AS DimProductID,
       |         t.YEAR * 10000 + 101 AS DimTargetDateID,
       |         t.SALESQUANTITYTARGET AS ProductTargetSalesQuantity
       |  FROM stg_targetdataproduct t
       |  LEFT JOIN dim_product p ON t.PRODUCTID = p.ProductID)""".stripMargin

  private val factSrcSalesTarget =
    s"""fact_srcsalestarget AS (
       |  SELECT COALESCE(s.DimStoreID, CAST(1 AS BIGINT)) AS DimStoreID,
       |         COALESCE(r.DimResellerID, CAST(1 AS BIGINT)) AS DimResellerID,
       |         COALESCE(ch.DimChannelID, CAST(1 AS BIGINT)) AS DimChannelID,
       |         t.YEAR * 10000 + 101 AS DimTargetDateID,
       |         t.TARGETSALESAMOUNT AS SalesTargetAmount
       |  FROM stg_targetdatachannel t
       |  LEFT JOIN dim_channel ch ON t.CHANNELNAME = ch.ChannelName
       |  LEFT JOIN dim_store s ON t.TARGETNAME = s.StoreName
       |  LEFT JOIN dim_reseller r ON t.TARGETNAME = r.ResellerName)""".stripMargin

  /** The shared WITH-prefix: every oracle is `WITH <star> SELECT …`. */
  val star: String = {
    val stages = Staging.schemas.keys.toSeq.sorted.map(stageCte)
    (stages ++ Seq(dimLocation, dimChannel, dimCustomer, dimReseller,
      dimStore, dimProduct, dimDate, factSalesActual,
      factProductSalesTarget, factSrcSalesTarget)).mkString("WITH ", ",\n", "\n")
  }

  /** Full oracle query over the star prefix. A select that opens with
    * its own WITH-list gets merged into the star's (SQL allows only one
    * WITH clause per query level).
    */
  def over(select: String): String =
    if (select.startsWith("WITH ")) star.stripSuffix("\n") + ",\n" + select.drop(5)
    else star + select
}

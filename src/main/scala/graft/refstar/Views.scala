package graft.refstar

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact.{dsum, Dec}

/** The reference's 7 analytical views (rahil/create_views.py:145-497)
  * composed over the refstar dimensional model. Each def returns the
  * view's frame; the gate (qv01-qv07) hash-compares it against a DuckDB
  * oracle running the reference's ORIGINAL view SQL over the same star —
  * so where a view is re-planned here for scale (qv03's OR-IS-NULL
  * spine), the compare proves the rewrite semantics-preserving.
  *
  * Exactness: every double aggregate goes through DECIMAL(25,6)
  * (graft.functions.Exact) in both engines; computed integers are LONG
  * on the Spark side and CAST AS BIGINT in the oracle; ROUND goes
  * through decimal, not double, rounding.
  *
  * Scale posture: the fact table is the only unbounded input. Every
  * view is a single pass over the fact with bounded dims joined on
  * equi-keys (AQE broadcasts them); window functions partition by
  * bounded keys (store/year/product-type), never unpartitioned.
  *
  * Inputs come from the MATERIALIZED star (Warehouse): like the
  * reference, whose views query stored dimension/fact tables
  * (rahil/create_views.py FROM Fact_SalesActual etc.), each view here is
  * a columnar parquet read of the persisted tables — never a per-query
  * rebuild of the ETL plan.
  */
object Views {

  private def t(spark: SparkSession, name: String): DataFrame =
    Warehouse.table(spark, name)

  private def nz(c: Column): Column = when(c =!= 0.0, c) // NULLIF(c, 0)

  /** VW_SalesPerformanceSummary (create_views.py:146-178): product x
    * month sales rollup with margin ratios.
    */
  def salesPerformanceSummary(spark: SparkSession): DataFrame = {
    val p = t(spark, "dim_product").select(
      col("DimProductID").as("__p_id"), col("ProductName"), col("ProductCategory"),
      col("ProductType"), col("ProductRetailPrice"), col("ProductCost"),
      col("ProductProfitMarginUnitPercent"))
    val d = t(spark, "dim_date").select(
      col("DATE_PKEY").as("__d_key"), col("YEAR"), col("QUARTER"),
      col("MONTH_NAME"), col("YEARMONTH"))
    t(spark, "fact_salesactual")
      .join(p, col("DimProductID") === col("__p_id"))
      .join(d, col("DimSaleDateID") === col("__d_key"))
      .groupBy("ProductName", "ProductCategory", "ProductType",
        "ProductRetailPrice", "ProductCost", "ProductProfitMarginUnitPercent",
        "YEAR", "QUARTER", "MONTH_NAME", "YEARMONTH")
      .agg(
        countDistinct(col("SalesHeaderID")).as("TransactionCount"),
        sum(col("SaleQuantity")).as("TotalQuantitySold"),
        dsum(col("SaleAmount")).as("TotalSalesAmount"),
        dsum(col("SaleTotalProfit")).as("TotalProfit"),
        (dsum(col("SaleUnitPrice")) / count(lit(1))).as("AvgUnitPrice"))
      .withColumn("AvgSalePerUnit",
        col("TotalSalesAmount") / when(col("TotalQuantitySold") =!= 0L,
          col("TotalQuantitySold")))
      .withColumn("ProfitMarginPercent",
        col("TotalProfit") / nz(col("TotalSalesAmount")) * 100)
  }

  /** VW_CustomerSalesAnalysis (create_views.py:180-203): demographics x
    * channel sales rollup with per-customer ratios.
    */
  def customerSalesAnalysis(spark: SparkSession): DataFrame = {
    val c = t(spark, "dim_customer").select(
      col("DimCustomerID").as("__c_id"), col("DimLocationID").as("__c_loc"),
      col("CustomerGender"))
    val l = t(spark, "dim_location").select(col("DimLocationID").as("__l_id"),
      col("State_Province"), col("Country"))
    val ch = t(spark, "dim_channel").select(
      col("DimChannelID").as("__ch_id"), col("ChannelName"), col("ChannelCategory"))
    val d = t(spark, "dim_date").select(
      col("DATE_PKEY").as("__d_key"), col("YEAR"), col("QUARTER"))
    t(spark, "fact_salesactual")
      .join(c, col("DimCustomerID") === col("__c_id"))
      .join(l, col("__c_loc") === col("__l_id"))
      .join(ch, col("DimChannelID") === col("__ch_id"))
      .join(d, col("DimSaleDateID") === col("__d_key"))
      .groupBy("CustomerGender", "State_Province", "Country", "ChannelName",
        "ChannelCategory", "YEAR", "QUARTER")
      .agg(
        countDistinct(col("DimCustomerID")).as("UniqueCustomers"),
        countDistinct(col("SalesHeaderID")).as("TotalTransactions"),
        dsum(col("SaleAmount")).as("TotalSalesAmount"),
        sum(col("SaleQuantity")).as("TotalQuantity"),
        dsum(col("SaleTotalProfit")).as("TotalProfit"),
        (dsum(col("SaleAmount")) / count(lit(1))).as("AvgTransactionAmount"))
      .withColumn("SalesPerCustomer",
        col("TotalSalesAmount") / when(col("UniqueCustomers") =!= 0L,
          col("UniqueCustomers")))
      .withColumn("ProfitPerCustomer",
        col("TotalProfit") / when(col("UniqueCustomers") =!= 0L,
          col("UniqueCustomers")))
  }

  /** VW_TargetVsActualPerformance (create_views.py:205-266) — the
    * reference's hardest view: an 8-way LEFT spine over both target
    * facts, then a LEFT join to the sales fact on FOUR stacked
    * `key = key OR key IS NULL` clauses, conditional actuals, and a
    * HAVING over both target sums.
    *
    * The naive condition is only executable as a nested loop (the
    * spine's NULL keys match every fact row). Re-planned here as a
    * union of three equi-join branches, split by the spine's key
    * null-pattern (fps and fst present / fps only / fst only):
    * within a branch the IS-NULL disjuncts are constant, so the
    * condition collapses to pure equi-keys. Spine rows where BOTH
    * target facts are absent are dropped up front: their groups have
    * SUM(target) = NULL on both sides, so the view's own HAVING
    * discards them — and their group keys (all dim names NULL) cannot
    * collide with any branch row's, since dim names are COALESCE'd
    * non-null. The DuckDB oracle runs the reference's original
    * OR-IS-NULL SQL, so the gate proves this rewrite exact.
    *
    * At scale: the spine (bounded by the target facts — entity-sized,
    * not fact-sized) is built ONCE, its null-pattern tagged as columns,
    * and CACHED; the three branch filters scan the cached rows instead
    * of re-planning the 8-way join per branch. Branches with an empty
    * slice collapse via AQE empty-relation propagation, so the data
    * decides how many fact passes actually run (one, for the reference
    * data). No BNLJ, no cartesian product.
    */
  def targetVsActual(spark: SparkSession): DataFrame = {
    val dimLoc = t(spark, "dim_location")
    val dimDate = t(spark, "dim_date")

    val td = dimDate
      .filter(col("YEAR") >= 2013 && col("DAY_NUM_IN_MONTH") === 1)
      .select(col("DATE_PKEY").as("__td_key"), col("YEAR").as("TargetYear"),
        col("QUARTER").as("TargetQuarter"), col("MONTH_NAME").as("TargetMonth"))
    val fps = t(spark, "fact_productsalestarget").select(
      col("DimProductID").as("__fps_pid"), col("DimTargetDateID").as("__fps_date"),
      col("ProductTargetSalesQuantity").as("__fps_qty"))
    val fst = t(spark, "fact_srcsalestarget").select(
      col("DimStoreID").as("__fst_sid"), col("DimResellerID").as("__fst_rid"),
      col("DimChannelID").as("__fst_chid"), col("DimTargetDateID").as("__fst_date"),
      col("SalesTargetAmount").as("__fst_amt"))

    val p = t(spark, "dim_product").select(col("DimProductID").as("__p_id"),
      col("ProductName"), col("ProductCategory"))
    val s = t(spark, "dim_store").select(col("DimStoreID").as("__s_id"),
      col("DimLocationID").as("__s_loc"), col("StoreName"))
    val sl = dimLoc.select(col("DimLocationID").as("__sl_id"),
      col("State_Province").as("StoreState"), col("Country").as("StoreCountry"))
    val r = t(spark, "dim_reseller").select(col("DimResellerID").as("__r_id"),
      col("DimLocationID").as("__r_loc"), col("ResellerName"))
    val rl = dimLoc.select(col("DimLocationID").as("__rl_id"),
      col("State_Province").as("ResellerState"))
    val c = t(spark, "dim_channel").select(
      col("DimChannelID").as("__c_id"), col("ChannelName"))

    // Built once, null-pattern tagged, cached: the three branches below
    // filter these rows rather than cloning the 8-way join subtree.
    // Caching is safe at scale — the spine is |target rows| × months,
    // bounded by the entity-sized target facts, never by sales volume.
    val spine = td
      .join(fps, col("__td_key") === col("__fps_date"), "left")
      .join(fst, col("__td_key") === col("__fst_date"), "left")
      .join(p, col("__fps_pid") === col("__p_id"), "left")
      .join(s, col("__fst_sid") === col("__s_id"), "left")
      .join(sl, col("__s_loc") === col("__sl_id"), "left")
      .join(r, col("__fst_rid") === col("__r_id"), "left")
      .join(rl, col("__r_loc") === col("__rl_id"), "left")
      .join(c, col("__fst_chid") === col("__c_id"), "left")
      // both-target-absent rows: HAVING-doomed, see scaladoc
      .filter(col("__fps_pid").isNotNull || col("__fst_sid").isNotNull)
      .withColumn("__has_fps", col("__fps_pid").isNotNull)
      .withColumn("__has_fst", col("__fst_sid").isNotNull)
      .cache()

    val fs = t(spark, "fact_salesactual").select(
      col("DimProductID").as("__fs_pid"), col("DimStoreID").as("__fs_sid"),
      col("DimResellerID").as("__fs_rid"), col("DimChannelID").as("__fs_chid"),
      col("DimSaleDateID").as("__fs_date"), col("SaleQuantity").as("__fs_qty"),
      col("SaleAmount").as("__fs_amt"), col("SaleTotalProfit").as("__fs_prf"))

    def branch(filter: Column, cond: Column): DataFrame =
      spine.filter(filter).join(fs, cond, "left")

    val both = branch(
      col("__has_fps") && col("__has_fst"),
      col("__fps_pid") === col("__fs_pid") && col("__fst_sid") === col("__fs_sid") &&
        col("__fst_rid") === col("__fs_rid") && col("__fst_chid") === col("__fs_chid"))
    val fpsOnly = branch(
      col("__has_fps") && !col("__has_fst"),
      col("__fps_pid") === col("__fs_pid"))
    val fstOnly = branch(
      !col("__has_fps") && col("__has_fst"),
      col("__fst_sid") === col("__fs_sid") && col("__fst_rid") === col("__fs_rid") &&
        col("__fst_chid") === col("__fs_chid"))

    val d = dimDate.select(col("DATE_PKEY").as("__d_key"),
      col("YEAR").as("__d_year"), col("QUARTER").as("__d_qtr"))

    val inYearQtr = col("__d_year") === col("TargetYear") &&
      col("__d_qtr") === col("TargetQuarter")

    both.union(fpsOnly).union(fstOnly)
      .join(d, col("__fs_date") === col("__d_key"), "left")
      .groupBy("ProductName", "ProductCategory", "StoreName", "StoreState",
        "StoreCountry", "ResellerName", "ResellerState", "ChannelName",
        "TargetYear", "TargetQuarter", "TargetMonth")
      .agg(
        sum(col("__fps_qty")).as("ProductSalesTarget"),
        dsum(col("__fst_amt")).as("SRCSalesTarget"),
        sum(when(inYearQtr, col("__fs_qty")).otherwise(0L)).as("ActualQuantitySold"),
        dsum(when(inYearQtr, col("__fs_amt")).otherwise(0.0)).as("ActualSalesAmount"),
        dsum(when(inYearQtr, col("__fs_prf")).otherwise(0.0)).as("ActualProfit"))
      .withColumn("QuantityTargetAchievementPercent",
        when(col("ProductSalesTarget") > 0L,
          col("ActualQuantitySold") / col("ProductSalesTarget") * 100)
          .otherwise(0.0))
      .withColumn("SalesTargetAchievementPercent",
        when(col("SRCSalesTarget") > 0.0,
          col("ActualSalesAmount") / col("SRCSalesTarget") * 100)
          .otherwise(0.0))
      .filter(col("ProductSalesTarget") > 0L || col("SRCSalesTarget") > 0.0)
  }

  /** Shared shape of VW_Store58Performance / VW_Store58DayOfWeekAnalysis:
    * the sales fact restricted to stores 5 and 8 with store + date
    * attributes attached.
    */
  /** Year-restricted sales-fact scan: `YEAR` on dim_date equals the
    * fact's `SaleYear` partition (both derive from the same yyyyMMdd
    * key), so a view whose dim-side filter is `YEAR IN (years)` can
    * push the SAME restriction onto the fact's partition column and
    * prune non-matching years at the file-listing level — at 100× this
    * is the difference between reading two years and the full history.
    * PlanChecksSpec asserts the resulting PartitionFilters.
    */
  private def factForYears(spark: SparkSession, years: Seq[Int]): DataFrame =
    Warehouse.factSalesForYears(spark, years)

  private def store58Base(spark: SparkSession, dateCols: Seq[String],
                          years: Seq[Int] = Nil): DataFrame = {
    val s = t(spark, "dim_store").select(
      col("DimStoreID").as("__s_id"), col("DimLocationID").as("__s_loc"),
      col("StoreNumber"), col("StoreName"))
    val sl = t(spark, "dim_location").select(col("DimLocationID").as("__sl_id"),
      col("State_Province").as("StoreState"))
    val d = t(spark, "dim_date")
      .select(col("DATE_PKEY").as("__d_key") +: dateCols.map(col): _*)
    (if (years.isEmpty) t(spark, "fact_salesactual")
     else factForYears(spark, years))
      .join(s, col("DimStoreID") === col("__s_id"))
      .join(sl, col("__s_loc") === col("__sl_id"))
      .join(d, col("DimSaleDateID") === col("__d_key"))
      .filter(col("StoreNumber").isin("5", "8"))
  }

  /** VW_Store58Performance (create_views.py:268-313): month-grain
    * profitability assessment of stores 5 and 8.
    */
  def store58Performance(spark: SparkSession): DataFrame =
    store58Base(spark,
      Seq("YEAR", "QUARTER", "MONTH_NAME", "MONTH_NUM_IN_YEAR"))
      .groupBy("StoreNumber", "StoreName", "StoreState", "YEAR", "QUARTER",
        "MONTH_NAME")
      .agg(
        countDistinct(col("SalesHeaderID")).as("TransactionCount"),
        sum(col("SaleQuantity")).as("TotalQuantitySold"),
        dsum(col("SaleAmount")).as("TotalSalesAmount"),
        dsum(col("SaleTotalProfit")).as("TotalProfit"),
        (dsum(col("SaleAmount")) / count(lit(1))).as("AvgTransactionAmount"),
        countDistinct(col("MONTH_NUM_IN_YEAR")).as("__months"))
      .withColumn("ProfitMarginPercent",
        col("TotalProfit") / nz(col("TotalSalesAmount")) * 100)
      .withColumn("AvgMonthlySales", col("TotalSalesAmount") / col("__months"))
      .withColumn("AvgMonthlyProfit", col("TotalProfit") / col("__months"))
      .withColumn("ProfitCategory",
        when(col("ProfitMarginPercent") > 40, "High Profit")
          .when(col("ProfitMarginPercent") > 25, "Medium Profit")
          .otherwise("Low Profit"))
      .withColumn("RevenueCategory",
        when(col("TotalSalesAmount") > 50000000, "High Revenue")
          .when(col("TotalSalesAmount") > 25000000, "Medium Revenue")
          .otherwise("Low Revenue"))
      .drop("__months")

  /** VW_StoreBonusRecommendation (create_views.py:315-365): ranks and
    * share-of-total windows inside a CASE-by-year bonus formula over
    * Men's/Women's Casual sales.
    */
  def storeBonusRecommendation(spark: SparkSession): DataFrame = {
    val s = t(spark, "dim_store").select(
      col("DimStoreID").as("__s_id"), col("DimLocationID").as("__s_loc"),
      col("StoreNumber"), col("StoreName"))
    val sl = t(spark, "dim_location").select(col("DimLocationID").as("__sl_id"),
      col("State_Province").as("StoreState"))
    val p = t(spark, "dim_product").select(
      col("DimProductID").as("__p_id"), col("ProductType"))
    val d = t(spark, "dim_date").select(
      col("DATE_PKEY").as("__d_key"), col("YEAR"))
    val w = Window.partitionBy(col("YEAR"), col("ProductType"))

    val grouped = factForYears(spark, Seq(2013, 2014))
      .join(s, col("DimStoreID") === col("__s_id"))
      .join(sl, col("__s_loc") === col("__sl_id"))
      .join(p, col("DimProductID") === col("__p_id"))
      .join(d, col("DimSaleDateID") === col("__d_key"))
      .filter(col("ProductType").isin("Men's Casual", "Women's Casual") &&
        col("YEAR").isin(2013, 2014) &&
        col("StoreNumber").isNotNull && col("StoreNumber") =!= "Unknown")
      .groupBy("StoreNumber", "StoreName", "StoreState", "YEAR", "ProductType")
      .agg(
        sum(col("SaleAmount").cast(Dec)).as("__amt_dec"),
        sum(col("SaleTotalProfit").cast(Dec)).as("__prf_dec"),
        sum(col("SaleQuantity")).as("TotalQuantity"),
        countDistinct(col("SalesHeaderID")).as("TransactionCount"))
      .withColumn("TotalSalesAmount", col("__amt_dec").cast("double"))
      .withColumn("TotalProfit", col("__prf_dec").cast("double"))
      .withColumn("ProfitMarginPercent",
        col("TotalProfit") / nz(col("TotalSalesAmount")) * 100)
      .withColumn("AvgTransactionValue",
        col("TotalSalesAmount") / col("TransactionCount"))

    val salesShare = col("TotalSalesAmount") /
      sum(col("__amt_dec")).over(w).cast("double")
    val profitShare = col("TotalProfit") /
      sum(col("__prf_dec")).over(w).cast("double")
    def bonus(pool: Double): Column =
      round((lit(pool) * salesShare * 0.5 + lit(pool) * profitShare * 0.5)
        .cast(Dec), 2).cast("double")

    grouped
      .withColumn("SalesRank",
        rank().over(w.orderBy(col("TotalSalesAmount").desc)).cast("long"))
      .withColumn("ProfitRank",
        rank().over(w.orderBy(col("TotalProfit").desc)).cast("long"))
      .withColumn("SalesSharePercent", salesShare * 100)
      .withColumn("ProfitSharePercent", profitShare * 100)
      .withColumn("RecommendedBonus",
        when(col("YEAR") === 2013, bonus(500000d))
          .when(col("YEAR") === 2014, bonus(400000d))
          .otherwise(0.0))
      .drop("__amt_dec", "__prf_dec")
  }

  /** VW_Store58DayOfWeekAnalysis (create_views.py:367-435): day-of-week
    * seasonality of stores 5 and 8 with share / vs-average windows.
    */
  def store58DayOfWeek(spark: SparkSession): DataFrame = {
    val w = Window.partitionBy(col("StoreNumber"), col("YEAR"))
    val winSales = sum(col("__amt_dec")).over(w).cast("double")
    val avgDaily = winSales / count(lit(1)).over(w)
    store58Base(spark, Seq("DAY_NAME", "DAY_NUM_IN_WEEK", "WEEKDAY_IND", "YEAR"),
      years = Seq(2013, 2014))
      .filter(col("YEAR").isin(2013, 2014))
      .groupBy("StoreNumber", "StoreName", "DAY_NAME", "DAY_NUM_IN_WEEK",
        "WEEKDAY_IND", "YEAR")
      .agg(
        countDistinct(col("SalesHeaderID")).as("TransactionCount"),
        sum(col("SaleAmount").cast(Dec)).as("__amt_dec"),
        dsum(col("SaleTotalProfit")).as("TotalProfit"),
        sum(col("SaleQuantity")).as("TotalQuantity"),
        (dsum(col("SaleAmount")) / count(lit(1))).as("AvgTransactionAmount"))
      .withColumn("TotalSalesAmount", col("__amt_dec").cast("double"))
      .withColumn("DaySharePercent", col("TotalSalesAmount") / winSales * 100)
      .withColumn("AvgDailySales", avgDaily)
      .withColumn("DayVsAvgPercent", col("TotalSalesAmount") / avgDaily * 100)
      .withColumn("DaySalesRank",
        rank().over(w.orderBy(col("TotalSalesAmount").desc)).cast("long"))
      .withColumn("DayType",
        when(col("DAY_NAME").isin("Saturday", "Sunday"), "Weekend")
          .otherwise("Weekday"))
      .withColumn("DayOrder",
        when(col("DAY_NAME") === "Monday", 1L).when(col("DAY_NAME") === "Tuesday", 2L)
          .when(col("DAY_NAME") === "Wednesday", 3L)
          .when(col("DAY_NAME") === "Thursday", 4L)
          .when(col("DAY_NAME") === "Friday", 5L)
          .when(col("DAY_NAME") === "Saturday", 6L)
          .when(col("DAY_NAME") === "Sunday", 7L))
      .drop("__amt_dec")
  }

  /** VW_MultiStoreVsSingleStoreAnalysis (create_views.py:437-497):
    * state-level per-store economics, compared against the multi- vs
    * single-store configuration average by year.
    */
  def multiStoreVsSingleStore(spark: SparkSession): DataFrame = {
    val store = t(spark, "dim_store")
      .filter(col("StoreNumber").isNotNull && col("StoreNumber") =!= "Unknown")
    val loc = t(spark, "dim_location").select(col("DimLocationID").as("__l_id"),
      col("State_Province"))

    val storeCountByState = store
      .select(col("DimStoreID").as("__sc_sid"), col("DimLocationID").as("__sc_loc"))
      .join(loc, col("__sc_loc") === col("__l_id"))
      .groupBy("State_Province")
      .agg(countDistinct(col("__sc_sid")).as("StoreCount"))
      .withColumn("StoreConfiguration",
        when(col("StoreCount") > 1L, "Multi-Store State")
          .otherwise("Single-Store State"))
      .withColumnRenamed("State_Province", "__scs_state")

    val s = store.select(col("DimStoreID").as("__s_id"),
      col("DimLocationID").as("__s_loc"))
    val d = t(spark, "dim_date").select(
      col("DATE_PKEY").as("__d_key"), col("YEAR"))

    val statePerf = factForYears(spark, Seq(2013, 2014))
      .join(s, col("DimStoreID") === col("__s_id"))
      .join(loc, col("__s_loc") === col("__l_id"))
      .join(d, col("DimSaleDateID") === col("__d_key"))
      .join(storeCountByState, col("State_Province") === col("__scs_state"))
      .filter(col("YEAR").isin(2013, 2014))
      .groupBy("State_Province", "StoreConfiguration", "StoreCount", "YEAR")
      .agg(
        countDistinct(col("__s_id")).as("ActiveStores"),
        dsum(col("SaleAmount")).as("TotalSalesAmount"),
        dsum(col("SaleTotalProfit")).as("TotalProfit"),
        sum(col("SaleQuantity")).as("TotalQuantity"),
        countDistinct(col("SalesHeaderID")).as("TotalTransactions"))
      .withColumn("AvgSalesPerStore", col("TotalSalesAmount") / col("ActiveStores"))
      .withColumn("AvgProfitPerStore", col("TotalProfit") / col("ActiveStores"))
      .withColumn("AvgTransactionsPerStore",
        col("TotalTransactions") / col("ActiveStores"))
      .withColumn("ProfitMarginPercent",
        col("TotalProfit") / nz(col("TotalSalesAmount")) * 100)
      .withColumn("AvgTransactionValue",
        col("TotalSalesAmount") / when(col("TotalTransactions") =!= 0L,
          col("TotalTransactions")))

    val wYear = Window.partitionBy(col("YEAR"))
    def configAvg(config: String, metric: String): Column = {
      val member = when(col("StoreConfiguration") === config, col(metric))
      sum(member.cast(Dec)).over(wYear).cast("double") /
        count(member).over(wYear)
    }
    val multiAvgSales = configAvg("Multi-Store State", "AvgSalesPerStore")
    val singleAvgSales = configAvg("Single-Store State", "AvgSalesPerStore")

    statePerf
      .withColumn("MultiStoreAvgSales", multiAvgSales)
      .withColumn("SingleStoreAvgSales", singleAvgSales)
      .withColumn("MultiStoreAvgProfit",
        configAvg("Multi-Store State", "AvgProfitPerStore"))
      .withColumn("SingleStoreAvgProfit",
        configAvg("Single-Store State", "AvgProfitPerStore"))
      .withColumn("SalesVsConfigAvgPercent",
        when(col("StoreConfiguration") === "Multi-Store State",
          col("AvgSalesPerStore") / multiAvgSales * 100)
          .otherwise(col("AvgSalesPerStore") / singleAvgSales * 100))
  }
}

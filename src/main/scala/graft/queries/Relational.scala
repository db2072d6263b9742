package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Exact._

/** Relational parity suite: every operator class in SURVEY.md §2
  * (projections P*, joins J*, aggregations A*, windows W*, sorts O*,
  * set-ops U*, scalar functions F*, data-quality Q*) re-expressed over
  * the TPC-H-ish test tables, Spark-first (DataFrame API, Catalyst does
  * the planning), with a DuckDB oracle per query.
  *
  * Scale notes are inline: every join states its expected physical
  * strategy at 100 TB (broadcast vs shuffle), every aggregate is
  * partial-aggregatable, and the one non-equi join (J6) is implemented
  * as the scale-safe union-of-equi-joins rewrite rather than a
  * BroadcastNestedLoopJoin.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** revenue expression used throughout (TPC-H style). */
  private def revenue(c: Column, d: Column): Column = c * (lit(1) - d)

  val all: Seq[Q] = Seq(

    // ----- P1: explicit projection (column pruning reaches the scan) ----
    Q("q01_projection",
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem") {
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    },

    // ----- P2/F10: derived projection with arithmetic measures ----------
    Q("q02_derived_projection",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      li.select(
        col("l_orderkey"), col("l_linenumber"),
        revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        (revenue(col("l_extendedprice"), col("l_discount")) *
          (lit(1) + col("l_tax"))).as("charge"))
    },

    // ----- P3/P5: IS NOT NULL + range + inequality predicates ----------
    Q("q03_filter_range",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
        |WHERE l_quantity >= 30 AND l_returnflag <> 'A'
        |  AND l_shipdate IS NOT NULL""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") >= 30 && col("l_returnflag") =!= "A" &&
          col("l_shipdate").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    },

    // ----- P4: IN-list predicate ----------------------------------------
    Q("q04_inlist",
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select("o_orderkey", "o_orderpriority", "o_totalprice")
    },

    // ----- A2/A6: grouped multi-aggregate (TPC-H Q1 shape) --------------
    // Partial (map-side) aggregation is automatic; 2-key low-cardinality
    // group-by shuffles only 6 groups of partials at any scale.
    Q("q05_groupby_agg",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(revenue(col("l_extendedprice"), col("l_discount")))
              .as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
    },

    // ----- A3: exact COUNT(DISTINCT) ------------------------------------
    Q("q06_count_distinct",
      """SELECT c_mktsegment,
        |  COUNT(DISTINCT c_nationkey) AS n_nations,
        |  COUNT(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
          countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"))
    },

    // ----- A4/F4: conditional aggregation -------------------------------
    Q("q07_conditional_agg",
      """SELECT l_linestatus,
        |  CAST(CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END
        |    AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS returned_qty,
        |  CAST(CAST(SUM(CAST(CASE WHEN l_returnflag <> 'R' THEN l_quantity ELSE 0 END
        |    AS DECIMAL(25,6))) AS STRING) AS DOUBLE) AS kept_qty
        |FROM lineitem GROUP BY l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(lit(0)).cast(Dec)).cast(DoubleType).as("returned_qty"),
          sum(when(col("l_returnflag") =!= "R", col("l_quantity"))
            .otherwise(lit(0)).cast(Dec)).cast(DoubleType).as("kept_qty"))
    },

    // ----- A5/F6: ratio-of-aggregates with divide-by-zero guard ---------
    Q("q08_ratio_nullif",
      s"""SELECT l_returnflag,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")}
         |    / NULLIF(${dsumSql("l_quantity")}, 0) AS revenue_per_unit
         |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg((dsum(revenue(col("l_extendedprice"), col("l_discount"))) /
          nullif(dsum(col("l_quantity")), lit(0.0))).as("revenue_per_unit"))
    },

    // ----- A7: HAVING over aggregates -----------------------------------
    Q("q09_having",
      s"""SELECT l_suppkey, ${dsumSql("l_quantity")} AS total_qty
         |FROM lineitem GROUP BY l_suppkey
         |HAVING ${dsumSql("l_quantity")} > 3000""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 3000)
    },

    // ----- A8: re-aggregation of an aggregate (agg over agg) ------------
    Q("q10_agg_over_agg",
      s"""WITH per_cust AS (
         |  SELECT o_custkey, COUNT(*) AS n_orders,
         |    ${dsumSql("o_totalprice")} AS total_spend
         |  FROM orders GROUP BY o_custkey)
         |SELECT c_mktsegment,
         |  CAST(SUM(n_orders) AS BIGINT) AS orders_in_segment,
         |  ${dsumSql("total_spend")} / COUNT(*) AS avg_customer_spend
         |FROM per_cust JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val perCust = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
      perCust
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(col("n_orders")).as("orders_in_segment"),
          davg(col("total_spend")).as("avg_customer_spend"))
    },

    // ----- J1: inner equi-join, 2 tables (broadcast at any scale) -------
    Q("q11_join_inner",
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name", "r_name")
    },

    // ----- J2: inner equi-join chain, 3 tables --------------------------
    Q("q12_join_chain3",
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name")
    },

    // ----- J3/Q2/F1/F2: left lookup on normalized expression keys -------
    // The reference's Dim_Location lookup pattern
    // (rahil/load_dimension_tables.py:158-163): COALESCE/CAST-normalized
    // composite key, left join, fallback to the unknown member. Still an
    // equi-join despite the expressions, so it hash-joins (and the dim
    // side broadcasts) at scale.
    Q("q13_lookup_left_coalesce",
      """SELECT c_custkey,
        |  COALESCE(CAST(d.n_nationkey AS BIGINT), -1) AS dim_nation_key,
        |  COALESCE(d.n_name, 'Unknown') AS nation_name
        |FROM customer c
        |LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20) d
        |  ON COALESCE(CAST(c.c_nationkey AS VARCHAR), '?')
        |   = COALESCE(CAST(d.n_nationkey AS VARCHAR), '?')""".stripMargin) {
      (s, dir) =>
        val norm = (c: Column) => coalesce(c.cast(StringType), lit("?"))
        val dim = t(s, dir, "nation").filter(col("n_nationkey") < 20)
        t(s, dir, "customer")
          .join(broadcast(dim), norm(col("c_nationkey")) === norm(col("n_nationkey")), "left")
          .select(
            col("c_custkey"),
            coalesce(col("n_nationkey").cast(LongType), lit(-1L)).as("dim_nation_key"),
            coalesce(col("n_name"), lit("Unknown")).as("nation_name"))
    },

    // ----- J4: star join (fact ⋈ 3 dims) + grouped rollup ---------------
    // At 100 TB: lineitem⋈orders and orders⋈customer are real shuffles
    // (lineitem/orders/customer all grow with data volume, so no static
    // broadcast hint — AQE upgrades to broadcast at runtime when the
    // build side measures small). Only nation (bounded, 25 rows at any
    // SF) keeps an explicit hint.
    Q("q14_star_join",
      s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).cast(LongType).as("order_year"))
          .agg(
            dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
    },

    // ----- J5: left-outer join chain from a spine -----------------------
    Q("q15_left_chain",
      """SELECT r_name, n_name, s_name, s_acctbal
        |FROM region
        |LEFT JOIN nation   ON r_regionkey = n_regionkey
        |LEFT JOIN supplier ON n_nationkey = s_nationkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "region")
          .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"), "left")
          .join(t(s, dir, "supplier"), col("n_nationkey") === col("s_nationkey"), "left")
          .select("r_name", "n_name", "s_name", "s_acctbal")
    },

    // ----- J6: theta join with OR-IS-NULL wildcard ----------------------
    // The reference's target-matching join (rahil/create_views.py:253-258)
    // treats NULL keys as wildcards. Naively that's a
    // BroadcastNestedLoopJoin (O(n*m)); here it is implemented as the
    // scale-safe rewrite — UNION ALL of two equi/cross branches — which
    // keeps both branches hash- or broadcast-joinable at 100 TB. The
    // oracle states the naive theta join; results are identical.
    Q("q16_theta_or_null",
      """WITH targets AS (
        |  SELECT s_suppkey AS t_id,
        |    CASE WHEN s_suppkey % 3 = 0 THEN NULL ELSE s_nationkey END AS t_nationkey,
        |    s_acctbal AS t_target
        |  FROM supplier)
        |SELECT n_nationkey, n_name, t_id, t_target
        |FROM nation JOIN targets
        |  ON (t_nationkey = n_nationkey OR t_nationkey IS NULL)""".stripMargin) {
      (s, dir) =>
        val targets = t(s, dir, "supplier").select(
          col("s_suppkey").as("t_id"),
          when(col("s_suppkey") % 3 === 0, lit(null).cast(IntegerType))
            .otherwise(col("s_nationkey")).as("t_nationkey"),
          col("s_acctbal").as("t_target"))
        val nation = t(s, dir, "nation")
        val keyed = nation.join(targets.filter(col("t_nationkey").isNotNull),
          col("t_nationkey") === col("n_nationkey"))
        val wild = nation.crossJoin(
          targets.filter(col("t_nationkey").isNull))
        val cols = Seq("n_nationkey", "n_name", "t_id", "t_target").map(col)
        keyed.select(cols: _*).unionAll(wild.select(cols: _*))
    },

    // ----- J7: join against a CTE/aggregated result ---------------------
    Q("q17_cte_join",
      """WITH nation_counts AS (
        |  SELECT n_regionkey, COUNT(*) AS n_nations FROM nation GROUP BY n_regionkey)
        |SELECT r_name, n_nations
        |FROM region JOIN nation_counts ON r_regionkey = n_regionkey""".stripMargin) {
      (s, dir) =>
        val counts = t(s, dir, "nation")
          .groupBy("n_regionkey").agg(count(lit(1)).as("n_nations"))
        t(s, dir, "region")
          .join(counts, col("r_regionkey") === col("n_regionkey"))
          .select("r_name", "n_nations")
    },

    // ----- U1/U2: UNION with distinct semantics -------------------------
    // Spark union = UNION ALL; the reference's UNION is distinct
    // (rahil/load_dimension_tables.py:88,102) so .distinct() is required.
    Q("q18_union_distinct",
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
    },

    // ----- W1: rank over an aggregate (window-over-agg) -----------------
    Q("q19_rank_over_agg",
      s"""WITH sup_rev AS (
         |  SELECT n_name, s_name,
         |    ${dsumSql("l_extendedprice * (1 - l_discount)")} AS rev
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation   ON s_nationkey = n_nationkey
         |  GROUP BY n_name, s_name)
         |SELECT n_name, s_name, rev,
         |  RANK() OVER (PARTITION BY n_name ORDER BY rev DESC, s_name) AS sales_rank
         |FROM sup_rev""".stripMargin) { (s, dir) =>
      val supRev = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "s_name")
        .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("rev"))
      val w = Window.partitionBy("n_name").orderBy(col("rev").desc, col("s_name"))
      supRev.withColumn("sales_rank", rank().over(w).cast(LongType))
    },

    // ----- W2: share-of-total window ------------------------------------
    Q("q20_share_of_total",
      s"""WITH sup_rev AS (
         |  SELECT n_name, s_name,
         |    ${dsumSql("l_extendedprice * (1 - l_discount)")} AS rev
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation   ON s_nationkey = n_nationkey
         |  GROUP BY n_name, s_name)
         |SELECT n_name, s_name, rev,
         |  (rev * 100) / CAST(CAST(SUM(CAST(rev AS DECIMAL(25,6)))
         |    OVER (PARTITION BY n_name) AS STRING) AS DOUBLE) AS pct_of_nation
         |FROM sup_rev""".stripMargin) { (s, dir) =>
      val supRev = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "s_name")
        .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("rev"))
      val w = Window.partitionBy("n_name")
      supRev.withColumn("pct_of_nation",
        (col("rev") * 100) / sum(col("rev").cast(Dec)).over(w).cast(DoubleType))
    },

    // ----- W3: comparative baseline (avg over window) -------------------
    Q("q21_avg_over_window",
      s"""WITH sup_rev AS (
         |  SELECT n_name, s_name,
         |    ${dsumSql("l_extendedprice * (1 - l_discount)")} AS rev
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation   ON s_nationkey = n_nationkey
         |  GROUP BY n_name, s_name)
         |SELECT n_name, s_name, rev,
         |  CAST(CAST(SUM(CAST(rev AS DECIMAL(25,6))) OVER (PARTITION BY n_name) AS STRING) AS DOUBLE)
         |    / COUNT(*) OVER (PARTITION BY n_name) AS nation_avg_rev,
         |  rev - CAST(CAST(SUM(CAST(rev AS DECIMAL(25,6))) OVER (PARTITION BY n_name) AS STRING) AS DOUBLE)
         |    / COUNT(*) OVER (PARTITION BY n_name) AS rev_vs_nation_avg
         |FROM sup_rev""".stripMargin) { (s, dir) =>
      val supRev = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "s_name")
        .agg(dsum(revenue(col("l_extendedprice"), col("l_discount"))).as("rev"))
      val w = Window.partitionBy("n_name")
      val nationAvg =
        sum(col("rev").cast(Dec)).over(w).cast(DoubleType) / count(lit(1)).over(w)
      supRev
        .withColumn("nation_avg_rev", nationAvg)
        .withColumn("rev_vs_nation_avg", col("rev") - nationAvg)
    },

    // ----- W4: conditional window aggregate -----------------------------
    Q("q22_conditional_window",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS order_year, o_totalprice,
        |  CAST(CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END
        |      AS DECIMAL(25,6))) OVER (PARTITION BY year(o_orderdate)) AS STRING) AS DOUBLE)
        |    / NULLIF(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
        |      OVER (PARTITION BY year(o_orderdate)), 0) AS urgent_avg_price
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(year(col("o_orderdate")))
      val urgent = col("o_orderpriority") === "1-URGENT"
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("order_year"),
        col("o_totalprice"),
        (sum(when(urgent, col("o_totalprice")).cast(Dec)).over(w).cast(DoubleType) /
          nullif(count(when(urgent, lit(1))).over(w), lit(0L)))
          .as("urgent_avg_price"))
    },

    // ----- O1/O2: global sort + LIMIT top-k ------------------------------
    // orderBy().limit() compiles to TakeOrderedAndProject: per-partition
    // top-k then a k-row merge on the driver — no global sort at scale.
    Q("q23_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select("o_orderkey", "o_totalprice")
          .limit(20)
    },

    // ----- O1: multi-column mixed-direction sort + limit ----------------
    Q("q24_multisort",
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey LIMIT 50""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .orderBy(col("c_mktsegment").asc, col("c_acctbal").desc, col("c_custkey"))
          .select("c_custkey", "c_mktsegment", "c_acctbal")
          .limit(50)
    },

    // ----- F1-F8: scalar function battery -------------------------------
    Q("q25_scalar_funcs",
      """SELECT c_custkey,
        |  COALESCE(c_mktsegment, 'Unknown') AS segment,
        |  c_name || ' [' || c_mktsegment || ']' AS name_tag,
        |  CASE WHEN c_acctbal > 5000 THEN 'High'
        |       WHEN c_acctbal > 0 THEN 'Medium'
        |       ELSE 'Low' END AS bal_bucket,
        |  ROUND(c_acctbal, 2) AS bal_round,
        |  NULLIF(c_acctbal, 0) AS bal_nullif,
        |  CAST(c_custkey AS VARCHAR) AS custkey_str
        |FROM customer""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        coalesce(col("c_mktsegment"), lit("Unknown")).as("segment"),
        concat(col("c_name"), lit(" ["), col("c_mktsegment"), lit("]")).as("name_tag"),
        when(col("c_acctbal") > 5000, "High")
          .when(col("c_acctbal") > 0, "Medium")
          .otherwise("Low").as("bal_bucket"),
        round(col("c_acctbal"), 2).as("bal_round"),
        nullif(col("c_acctbal"), lit(0.0)).as("bal_nullif"),
        col("c_custkey").cast(StringType).as("custkey_str"))
    },

    // ----- F9 (partial): date-part extraction ---------------------------
    Q("q26_date_parts",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
        |  CAST(day(o_orderdate) AS BIGINT) AS order_day,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
        |  strftime(o_orderdate, '%Y-%m') AS year_month,
        |  isodow(o_orderdate) AS iso_dow
        |FROM orders""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(LongType).as("order_year"),
        month(col("o_orderdate")).cast(LongType).as("order_month"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("order_day"),
        quarter(col("o_orderdate")).cast(LongType).as("order_quarter"),
        date_format(col("o_orderdate"), "yyyy-MM").as("year_month"),
        (weekday(col("o_orderdate")) + 1).cast(LongType).as("iso_dow"))
    },

    // ----- Q1/S7 + IDENTITY: dimension with unknown member + surrogate keys
    // Reference pattern: seed surrogate key 1 as the Unknown row
    // (rahil/create_dimension_tables.py:91-130), then dense keys.
    // row_number over a single partition is fine for dim-sized tables
    // (documented scaling caveat; facts never get row_number keys).
    Q("q28_dim_surrogate",
      """SELECT CAST(1 AS BIGINT) AS dim_nation_key,
        |  'Unknown' AS nation_name, 'Unknown' AS region_name
        |UNION ALL
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_name) + 1 AS BIGINT),
        |  n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin) {
      (s, dir) =>
        val base = t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_name").as("nation_name"), col("r_name").as("region_name"))
        graft.etl.SurrogateKeys.withUnknownMember(
          s, base, "dim_nation_key", orderCol = "nation_name",
          unknown = Map("nation_name" -> "Unknown", "region_name" -> "Unknown"))
    },

    // ----- Q2: fact build with FK fallback to the unknown member --------
    Q("q29_fact_fk_fallback",
      """WITH dim AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_name) + 1 AS BIGINT) AS dim_key,
        |    n_nationkey
        |  FROM nation WHERE n_nationkey < 20)
        |SELECT o_orderkey, COALESCE(d.dim_key, 1) AS dim_nation_key, o_totalprice
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN dim d ON c_nationkey = d.n_nationkey""".stripMargin) {
      (s, dir) =>
        val dim = graft.etl.SurrogateKeys.globalRowNumber(
            t(s, dir, "nation").filter(col("n_nationkey") < 20),
            Seq("n_name"), "dim_key", startAt = 2L)
          .select("dim_key", "n_nationkey")
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(dim), col("c_nationkey") === col("n_nationkey"), "left")
          .select(
            col("o_orderkey"),
            coalesce(col("dim_key"), lit(1L)).as("dim_nation_key"),
            col("o_totalprice"))
    },

    // ----- events: batch windowed aggregation (streaming-equivalent) ----
    Q("q30_events_hourly",
      s"""SELECT event_type, CAST(ts AS DATE) AS event_date,
         |  hour(ts) AS event_hour,
         |  COUNT(*) AS n_events, ${dsumSql("value")} AS total_value
         |FROM events
         |GROUP BY event_type, CAST(ts AS DATE), hour(ts)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(
            col("event_type"),
            col("ts").cast(DateType).as("event_date"),
            hour(col("ts")).cast(LongType).as("event_hour"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
    },
  )
}

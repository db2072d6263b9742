package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Programmatic date-dimension generator — full 34-attribute parity
  * with the reference's DIM_DATE (rahil/create_views.py:62-72 lists the
  * authoritative column set; graft.refstar maps these snake_case names
  * onto the reference's spelling).
  *
  * Re-expresses the reference's 730-row DIM_DATE
  * (private_ddl/example_dim_date.sql + rahil/load_dim_date.py:34-62, 34
  * columns, 2013–2014) as a pure DataFrame computation:
  * sequence(start,end) → explode → date functions. No SQL-script
  * splitting needed. Generated distributed (one explode over a 1-row
  * frame is fine for 2 years; for a 100-year spine use
  * spark.range(days).select(date_add(...)) which parallelizes).
  *
  * Conventions, chosen engine-portable (every column is reproduced
  * exactly by the DuckDB oracle):
  *  - day-of-week is ISO (1=Monday..7=Sunday)
  *  - week number is ISO (both Spark weekofyear and DuckDB week)
  *  - weeks begin Monday (both engines' date_trunc('week'))
  *  - fiscal calendar starts July 1 (+6 months, reference convention)
  *  - holiday indicator covers the fixed-date US holidays
  *    (Jan 1 / Jul 4 / Dec 25) — observed-day logic is policy, left out
  */
object DateDim {

  def build(spark: SparkSession,
            start: String = "2013-01-01",
            end: String = "2014-12-31"): DataFrame = {
    val days = spark.sql(
      s"SELECT explode(sequence(to_date('$start'), to_date('$end'), interval 1 day)) AS d")
    val d = col("d")
    val isoDow = (weekday(d) + 1).cast(LongType)
    val fiscal = add_months(d, 6)
    val holiday = (month(d) === 1 && dayofmonth(d) === 1) ||
      (month(d) === 7 && dayofmonth(d) === 4) ||
      (month(d) === 12 && dayofmonth(d) === 25)
    days.select(
      date_format(d, "yyyyMMdd").cast(LongType).as("date_pkey"),
      d.as("date"),
      concat(date_format(d, "MMMM"), lit(" "),
        dayofmonth(d).cast("string"), lit(", "),
        year(d).cast("string")).as("full_date_desc"),
      isoDow.as("iso_day_of_week"),
      isoDow.as("day_num_in_week"),
      date_format(d, "EEEE").as("day_name"),
      date_format(d, "EEE").as("day_abbrev"),
      when(isoDow >= 6, "Weekend").otherwise("Weekday").as("weekday_ind"),
      dayofmonth(d).cast(LongType).as("day_num_in_month"),
      dayofyear(d).cast(LongType).as("day_num_in_year"),
      weekofyear(d).cast(LongType).as("week_num_in_year"),
      date_trunc("week", d).cast("date").as("week_begin_date"),
      date_format(date_trunc("week", d), "yyyyMMdd").cast(LongType)
        .as("week_begin_date_nkey"),
      date_add(date_trunc("week", d).cast("date"), 6).as("week_end_date"),
      date_format(date_add(date_trunc("week", d).cast("date"), 6), "yyyyMMdd")
        .cast(LongType).as("week_end_date_nkey"),
      month(d).cast(LongType).as("month_num_in_year"),
      date_format(d, "MMMM").as("month_name"),
      date_format(d, "MMM").as("month_abbrev"),
      quarter(d).cast(LongType).as("quarter"),
      concat(lit("Q"), quarter(d).cast("string")).as("quarter_name"),
      concat(year(d).cast("string"), lit("-Q"), quarter(d).cast("string"))
        .as("yearquarter"),
      year(d).cast(LongType).as("year"),
      date_format(d, "yyyy-MM").as("year_month"),
      (year(d).cast(LongType) * 100 + month(d)).as("yearmonth_num"),
      when(d === last_day(d), "Month-End").otherwise("Not Month-End")
        .as("month_end_ind"),
      dayofmonth(last_day(d)).cast(LongType).as("days_in_month"),
      when(holiday, "Holiday").otherwise("Not Holiday").as("holiday_ind"),
      year(fiscal).cast(LongType).as("fiscal_year"),
      quarter(fiscal).cast(LongType).as("fiscal_quarter"),
      month(fiscal).cast(LongType).as("fiscal_month_num"),
      (year(fiscal).cast(LongType) * 100 + month(fiscal)).as("fiscal_yearmonth_num"),
      weekofyear(fiscal).cast(LongType).as("fiscal_week_num"),
      date_format(fiscal, "yyyy-MM").as("fiscal_year_month"),
      concat(year(fiscal).cast("string"), lit("-Q"), quarter(fiscal).cast("string"))
        .as("fiscal_yearquarter"),
      when(quarter(fiscal) <= 2, 1L).otherwise(2L).cast(LongType)
        .as("fiscal_halfyear"),
      d.cast(TimestampNTZType).as("sql_timestamp"),
      // Type-0 SCD bookkeeping (private_ddl/example_dim_date.sql:28-30):
      // the calendar row is effective from its own date and never expires.
      lit("Y").as("current_row_ind"),
      d.as("effective_date"),
      to_date(lit("9999-12-31")).as("expiration_date"))
  }

  /** DuckDB oracle SQL producing the identical frame. */
  def oracleSql(start: String = "2013-01-01", end: String = "2014-12-31"): String =
    s"""WITH days AS (
       |  SELECT CAST(generate_series AS DATE) AS d
       |  FROM generate_series(DATE '$start', DATE '$end', INTERVAL 1 DAY))
       |SELECT CAST(strftime(d, '%Y%m%d') AS BIGINT) AS date_pkey,
       |  d AS date,
       |  monthname(d) || ' ' || CAST(day(d) AS VARCHAR) || ', '
       |    || CAST(year(d) AS VARCHAR) AS full_date_desc,
       |  isodow(d) AS iso_day_of_week,
       |  isodow(d) AS day_num_in_week,
       |  dayname(d) AS day_name,
       |  strftime(d, '%a') AS day_abbrev,
       |  CASE WHEN isodow(d) >= 6 THEN 'Weekend' ELSE 'Weekday' END AS weekday_ind,
       |  day(d) AS day_num_in_month,
       |  dayofyear(d) AS day_num_in_year,
       |  week(d) AS week_num_in_year,
       |  CAST(date_trunc('week', d) AS DATE) AS week_begin_date,
       |  CAST(strftime(date_trunc('week', d), '%Y%m%d') AS BIGINT)
       |    AS week_begin_date_nkey,
       |  CAST(date_trunc('week', d) + INTERVAL 6 DAY AS DATE) AS week_end_date,
       |  CAST(strftime(date_trunc('week', d) + INTERVAL 6 DAY, '%Y%m%d') AS BIGINT)
       |    AS week_end_date_nkey,
       |  month(d) AS month_num_in_year,
       |  monthname(d) AS month_name,
       |  strftime(d, '%b') AS month_abbrev,
       |  quarter(d) AS quarter,
       |  'Q' || CAST(quarter(d) AS VARCHAR) AS quarter_name,
       |  CAST(year(d) AS VARCHAR) || '-Q' || CAST(quarter(d) AS VARCHAR)
       |    AS yearquarter,
       |  year(d) AS year,
       |  strftime(d, '%Y-%m') AS year_month,
       |  year(d) * 100 + month(d) AS yearmonth_num,
       |  CASE WHEN d = last_day(d) THEN 'Month-End' ELSE 'Not Month-End' END
       |    AS month_end_ind,
       |  day(last_day(d)) AS days_in_month,
       |  CASE WHEN (month(d) = 1 AND day(d) = 1) OR (month(d) = 7 AND day(d) = 4)
       |         OR (month(d) = 12 AND day(d) = 25)
       |       THEN 'Holiday' ELSE 'Not Holiday' END AS holiday_ind,
       |  year(d + INTERVAL 6 MONTH) AS fiscal_year,
       |  quarter(d + INTERVAL 6 MONTH) AS fiscal_quarter,
       |  month(d + INTERVAL 6 MONTH) AS fiscal_month_num,
       |  year(d + INTERVAL 6 MONTH) * 100 + month(d + INTERVAL 6 MONTH)
       |    AS fiscal_yearmonth_num,
       |  week(d + INTERVAL 6 MONTH) AS fiscal_week_num,
       |  strftime(d + INTERVAL 6 MONTH, '%Y-%m') AS fiscal_year_month,
       |  CAST(year(d + INTERVAL 6 MONTH) AS VARCHAR) || '-Q'
       |    || CAST(quarter(d + INTERVAL 6 MONTH) AS VARCHAR) AS fiscal_yearquarter,
       |  CAST(CASE WHEN quarter(d + INTERVAL 6 MONTH) <= 2 THEN 1 ELSE 2 END
       |    AS BIGINT) AS fiscal_halfyear,
       |  CAST(d AS TIMESTAMP) AS sql_timestamp,
       |  'Y' AS current_row_ind,
       |  d AS effective_date,
       |  DATE '9999-12-31' AS expiration_date
       |FROM days""".stripMargin
}

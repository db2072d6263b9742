package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Programmatic date-dimension generator.
  *
  * Re-expresses the reference's 730-row DIM_DATE
  * (private_ddl/example_dim_date.sql + rahil/load_dim_date.py:34-62, 34
  * columns, 2013–2014) as a pure DataFrame computation:
  * sequence(start,end) → explode → date functions. No SQL-script
  * splitting needed. Generated distributed (one explode over a 1-row
  * frame is fine for 2 years; for a 100-year spine use
  * spark.range(days).select(date_add(...)) which parallelizes).
  *
  * Day-of-week convention is ISO (1=Monday..7=Sunday) to be portable
  * across engines; the fiscal calendar (offset +6 months, July start) is
  * hand-rolled like the reference's.
  */
object DateDim {

  def build(spark: SparkSession,
            start: String = "2013-01-01",
            end: String = "2014-12-31"): DataFrame = {
    val days = spark.sql(
      s"SELECT explode(sequence(to_date('$start'), to_date('$end'), interval 1 day)) AS d")
    val d = col("d")
    val isoDow = (weekday(d) + 1).cast(LongType)
    days.select(
      date_format(d, "yyyyMMdd").cast(LongType).as("date_pkey"),
      d.as("date"),
      year(d).cast(LongType).as("year"),
      quarter(d).cast(LongType).as("quarter"),
      month(d).cast(LongType).as("month_num_in_year"),
      date_format(d, "MMMM").as("month_name"),
      dayofmonth(d).cast(LongType).as("day_num_in_month"),
      dayofyear(d).cast(LongType).as("day_num_in_year"),
      isoDow.as("iso_day_of_week"),
      date_format(d, "EEEE").as("day_name"),
      when(isoDow >= 6, "Weekend").otherwise("Weekday").as("weekday_ind"),
      date_format(d, "yyyy-MM").as("year_month"),
      // fiscal year starts July 1 (reference convention: +6 months)
      year(add_months(d, 6)).cast(LongType).as("fiscal_year"),
      quarter(add_months(d, 6)).cast(LongType).as("fiscal_quarter"),
      month(add_months(d, 6)).cast(LongType).as("fiscal_month_num"))
  }

  /** DuckDB oracle SQL producing the identical frame. */
  def oracleSql(start: String = "2013-01-01", end: String = "2014-12-31"): String =
    s"""WITH days AS (
       |  SELECT CAST(generate_series AS DATE) AS d
       |  FROM generate_series(DATE '$start', DATE '$end', INTERVAL 1 DAY))
       |SELECT CAST(strftime(d, '%Y%m%d') AS BIGINT) AS date_pkey,
       |  d AS date,
       |  year(d) AS year,
       |  quarter(d) AS quarter,
       |  month(d) AS month_num_in_year,
       |  monthname(d) AS month_name,
       |  day(d) AS day_num_in_month,
       |  dayofyear(d) AS day_num_in_year,
       |  isodow(d) AS iso_day_of_week,
       |  dayname(d) AS day_name,
       |  CASE WHEN isodow(d) >= 6 THEN 'Weekend' ELSE 'Weekday' END AS weekday_ind,
       |  strftime(d, '%Y-%m') AS year_month,
       |  year(d + INTERVAL 6 MONTH) AS fiscal_year,
       |  quarter(d + INTERVAL 6 MONTH) AS fiscal_quarter,
       |  month(d + INTERVAL 6 MONTH) AS fiscal_month_num
       |FROM days""".stripMargin
}

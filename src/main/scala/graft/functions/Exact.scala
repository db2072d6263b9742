package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine exact aggregation helpers.
  *
  * Floating-point SUM/AVG are order-dependent, and Spark's shuffle order
  * differs from any single-node oracle (DuckDB), so a raw `sum(double)`
  * can differ in the last few ulps run-to-run. The correctness gate
  * hash-compares values exactly, so every double aggregate in the query
  * suite goes through decimal: cast each addend to DECIMAL(25,6)
  * (exact, associative sum), then cast the total back to double. The
  * matching oracle SQL does the identical cast, so results are
  * bit-identical regardless of execution order or parallelism.
  *
  * This is also the right call at 100 TB: decimal partial aggregates are
  * deterministic under retries/speculative execution, which makes
  * pipeline output stable across reruns (important for incremental
  * training-data jobs).
  */
object Exact {
  val Dec: DecimalType = DecimalType(25, 6)

  /** Exact-sum of a double column: SUM(CAST(x AS DECIMAL(25,6))) -> double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact average: exact sum divided by COUNT(*) in double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Oracle-side (DuckDB) text for the same exact sum. The decimal →
    * double hop goes THROUGH STRING (a DuckDB alias for VARCHAR that
    * Spark also parses, so the text stays shared-cross-engine): DuckDB's
    * direct CAST(DECIMAL AS DOUBLE) divides double(unscaled) by
    * double(10^scale) and is up to 1 ulp off once the sum exceeds 2^53
    * quantums (first seen at sf1: a 1e17-quantum revenue sum), while
    * Spark's BigDecimal.doubleValue is correctly rounded; string →
    * double is correctly rounded in both engines, so the hop restores
    * bit-equality at any magnitude.
    */
  def dsumSql(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(25,6))) AS STRING) AS DOUBLE)"

  def davgSql(expr: String): String = s"${dsumSql(expr)} / COUNT(*)"
}

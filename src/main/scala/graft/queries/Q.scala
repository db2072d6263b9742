package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gated query: a Spark builder plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same parquet tables. The
  * driver's compare sorts columns by name and hash-compares values, so
  * builder and oracle must agree on column names AND result types.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, Some(oracle))
}

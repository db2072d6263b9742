package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Surrogate-key assignment for dimension tables.
  *
  * Replaces the reference's `IDENTITY(1,1)` columns
  * (private_ddl/example_dimension_table.sql:5) plus the seeded Unknown
  * member (rahil/create_dimension_tables.py:91-130): key 1 is always the
  * Unknown row, real rows get dense keys 2..N+1 ordered by a
  * deterministic business column.
  *
  * Deliberately row_number-based (dense, deterministic) rather than
  * monotonically_increasing_id (sparse, partition-dependent) because the
  * reference's COALESCE(key, 1) fallback semantics require key 1 to be
  * reserved. The single-partition window is safe only because dimensions
  * are small (≤ millions of rows); fact tables must never be keyed this
  * way — at 100 TB facts carry natural keys or zipWithIndex-style
  * partition-offset keys.
  */
object SurrogateKeys {

  /** Prepend an Unknown member (key 1) and assign dense surrogate keys
    * 2..N+1 to `base`, ordered by `orderCol`.
    *
    * @param unknown column -> literal value for the Unknown row; columns
    *                absent from the map become NULL.
    */
  def withUnknownMember(
      spark: SparkSession,
      base: DataFrame,
      keyCol: String,
      orderCol: String,
      unknown: Map[String, Any]): DataFrame =
    withUnknownMemberOrdered(spark, base, keyCol, Seq(orderCol), unknown)

  /** Multi-column ordering variant: dimensions whose business key is
    * composite (e.g. the reference's Dim_Location 5-column address key,
    * rahil/load_dimension_tables.py:73-115) need every key column in the
    * ORDER BY for the surrogate assignment to be deterministic.
    */
  def withUnknownMemberOrdered(
      spark: SparkSession,
      base: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      unknown: Map[String, Any]): DataFrame = {
    val keyed = base.withColumn(
      keyCol,
      (row_number().over(Window.orderBy(orderCols.map(col): _*)) + 1)
        .cast(LongType))
    val unknownRow = base.limit(0) // inherit schema
    val filled = base.columns.foldLeft(
      unknownRow.sparkSession.range(1).toDF()) { (df, c) =>
      df.withColumn(c,
        unknown.get(c).map(v => lit(v)).getOrElse(lit(null))
          .cast(base.schema(c).dataType))
    }.withColumn(keyCol, lit(1L)).drop("id")
    filled.select(keyed.columns.map(col).toIndexedSeq: _*).unionAll(keyed)
      .select((keyCol +: base.columns.toIndexedSeq).map(col): _*)
  }
}

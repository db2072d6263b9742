package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Deliberately dense and deterministic (equal to
  * `row_number() OVER (ORDER BY orderCols) + 1`) rather than
  * monotonically_increasing_id (sparse, partition-dependent) because the
  * reference's COALESCE(key, 1) fallback semantics require key 1 to be
  * reserved. Assignment is [[globalRowNumber]] — range-partitioned sort
  * plus per-partition offsets — NOT a single-partition window, so a
  * large dimension numbers in parallel; facts still must never be keyed
  * this way (they carry natural keys).
  */
object SurrogateKeys {

  /** Dense global rank `startAt..startAt+N-1` under ORDER BY
    * `orderCols`, computed WITHOUT a single-partition window: range-
    * repartition on the order columns, sort within partitions, then
    * zipWithIndex — per-partition local position plus the preceding
    * partitions' row counts (the one extra count job zipWithIndex
    * runs). Because range partitions tile the key space in order, the
    * result equals the global `row_number() OVER (ORDER BY ...)`
    * regardless of where the sampled range boundaries fall — boundary
    * placement shifts WHICH partition a row sorts into, never its
    * global rank — so the numbering is deterministic and engine-exact
    * (the DuckDB oracles compute the window form) while every
    * partition numbers in parallel. Ties across `orderCols` remain the
    * caller's responsibility, exactly as with the window form: pass a
    * key set that is unique.
    */
  def globalRowNumber(df: DataFrame, orderCols: Seq[String], keyCol: String,
                      startAt: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(keyCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + startAt))
    }
    spark.createDataFrame(rdd, schema)
  }

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
    val keyed = globalRowNumber(base, orderCols, keyCol, startAt = 2L)
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

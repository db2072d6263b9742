package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `right.ts <= left.ts` for the same key. Spark has no native ASOF
  * operator; per the custom-operator preference order this composes
  * existing ops rather than adding a SparkPlan: tag both sides, UNION,
  * and carry the right payload forward with a running
  * `last(ignoreNulls)` window — one shuffle on (key), no point-wise
  * range probing, scales like any windowed aggregation.
  *
  * Right rows must be unique per (key, ts) — pre-aggregate duplicates
  * first, otherwise which duplicate wins is engine-dependent (DuckDB's
  * native ASOF has the same caveat).
  */
object AsOfJoin {

  /** @param left      probe side, must contain `key` and `ts`
    * @param right     state side: `key`, `ts`, plus `valueCols`
    * @param valueCols right payload columns carried to the matches
    * @return left rows that have a match, with `asof_<col>` and
    *         `asof_ts` columns appended (inner-asof semantics)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__asof_ts", lit(null).cast(left.schema(ts).dataType))
      .select((leftCols.map(col) :+ col("__tag") :+ col("__asof_ts")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val r = right
      .withColumn("__tag", lit(0))
      .withColumn("__asof_ts", col(ts))
      .select((leftCols.map(c =>
        if (c == key || c == ts) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__tag") :+ col("__asof_ts")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    // right (tag 0) sorts before left (tag 1) at equal ts -> inclusive <=
    val w = Window.partitionBy(key).orderBy(col(ts), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("asof_ts", last(col("__asof_ts"), ignoreNulls = true).over(w))
    val withVals = valueCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    withVals
      .filter(col("__tag") === 1 && col("asof_ts").isNotNull)
      .select((leftCols.map(col) :+ col("asof_ts")) ++
        valueCols.map(c => col(s"asof_$c")): _*)
  }
}

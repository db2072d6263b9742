package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse integrity audit — the dbt-test / Great-Expectations move
  * as a single gated report: surrogate-key uniqueness per dimension,
  * referential integrity per fact FK, and measure null rates, each one
  * small aggregate unioned into a (metric, value) table. At 100 TB
  * every check is either a partial-agg scan (counts) or a broadcast
  * anti-join against a bounded dimension — no check materializes
  * violations, only counts them; a nonzero row is the alert, and the
  * gate hash-compares the exact zeros (the FK-fallback design makes
  * orphans structurally impossible, and this PROVES it holds).
  */
object Integrity {

  /** One (metric, value) row per check. `fks` maps a fact FK column to
    * (dimension, its key column, a label); `measures` are fact columns
    * audited for NULLs.
    */
  def report(fact: DataFrame, factName: String,
             fks: Seq[(String, DataFrame, String, String)],
             measures: Seq[String]): DataFrame = {
    // row count and EVERY null-rate counter ride one partial aggregate
    // (one fact scan), then the single agg row unpivots to metric rows
    // — a per-measure agg would re-scan the fact once per metric
    val factAggs = count(lit(1)).as(s"rows_$factName") +:
      measures.map(m => sum(when(col(m).isNull, 1L).otherwise(0L))
        .as(s"nulls_${factName}_$m"))
    val factMetrics = fact.agg(factAggs.head, factAggs.tail: _*)
      .unpivot(Array.empty, "metric", "value")
    val rows = factMetrics +:
      (fks.map { case (_, dim, keyCol, dimName) =>
        dim.agg((count(col(keyCol)) - countDistinct(col(keyCol))).as("value"))
          .select(lit(s"dup_keys_$dimName").as("metric"), col("value"))
      } ++
      fks.map { case (fkCol, dim, keyCol, dimName) =>
        fact.join(broadcast(dim.select(col(keyCol).as("__k"))),
            fact(fkCol) === col("__k"), "left_anti")
          .agg(count(lit(1)).as("value"))
          .select(lit(s"orphans_${factName}_$fkCol").as("metric"), col("value"))
      })
    rows.reduce(_ unionByName _)
  }
}

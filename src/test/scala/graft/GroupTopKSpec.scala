package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Text

/** GroupTopK bounded-buffer aggregate: equality with the window idiom,
  * partition invariance (the mergeability proof), tie-breaking, NULL
  * skipping, and groups smaller than k.
  */
class GroupTopKSpec extends SparkSpec {

  private def windowTopK(k: Int) = {
    val o = Tables(spark, sfDir, "orders")
    o.withColumn("rk", row_number().over(
        Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rk") <= k)
      .select(col("o_orderpriority"), col("rk").cast("long").as("rk"),
        col("o_orderkey"), col("o_totalprice"))
  }

  private def aggTopK(k: Int, partitions: Int) = {
    val o = Tables(spark, sfDir, "orders").repartition(partitions)
    o.groupBy("o_orderpriority")
      .agg(Text.groupTopK(col("o_totalprice"), col("o_orderkey"), k).as("topk"))
      .select(col("o_orderpriority"), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rk"),
        col("e.id").as("o_orderkey"), col("e.value").as("o_totalprice"))
  }

  test("matches the row_number window formulation exactly") {
    val w = windowTopK(5).collect().toSet
    val a = aggTopK(5, 4).collect().toSet
    assert(a == w)
  }

  test("partition-invariant: 1 partition == 7 partitions (merge correctness)") {
    assert(aggTopK(3, 1).collect().toSet == aggTopK(3, 7).collect().toSet)
  }

  test("k larger than the group returns the whole group, ranked") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 10L), ("a", 2.0, 11L), ("b", 5.0, 20L))
      .toDF("g", "v", "id")
    val out = df.groupBy("g")
      .agg(Text.groupTopK(col("v"), col("id"), 10).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"), col("e.id").as("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(("a", 0, 11L), ("a", 1, 10L), ("b", 0, 20L)))
  }

  test("ties break toward the smaller id; NULLs and NaNs are skipped") {
    import spark.implicits._
    val df = Seq(
      ("g", Some(7.0), Some(3L)), ("g", Some(7.0), Some(1L)),
      ("g", Some(7.0), Some(2L)), ("g", None, Some(99L)),
      ("g", Some(9.0), None), ("g", Some(Double.NaN), Some(98L)))
      .toDF("g", "v", "id")
    val ids = df.groupBy("g")
      .agg(Text.groupTopK(col("v"), col("id"), 2).as("t"))
      .select(explode(col("t.id")).as("id"))
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("partial aggregation happens before the exchange (map-side pruning)") {
    val plan = aggTopK(3, 4).queryExecution.executedPlan.toString
    // ObjectHashAggregate partial → exchange → final: two aggregate
    // nodes with the exchange between them
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    val firstAgg = plan.indexOf("ObjectHashAggregate")
    val exch = plan.indexOf("Exchange hashpartitioning", firstAgg)
    val secondAgg = plan.indexOf("ObjectHashAggregate", firstAgg + 1)
    assert(exch >= 0 && secondAgg > 0 && secondAgg > exch,
      "expected partial ObjectHashAggregate below the shuffle\n" + plan.take(3000))
  }
}

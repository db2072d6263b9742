package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides of a recurring
  * join on the join key eliminates the per-query shuffle entirely — the
  * technique for repeated 100 TB fact ⋈ fact joins. Asserts the plan
  * reads bucketed scans and contains no hash-partitioning exchange.
  */
class BucketingSpec extends SparkSpec {

  test("equal-bucketed tables join without a shuffle") {
    val warehouse = new java.io.File("target/test-warehouse-" + System.nanoTime())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, sfDir, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"${warehouse.getAbsolutePath}/li_b")
        .mode("overwrite").saveAsTable("li_b")
      Tables(spark, sfDir, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"${warehouse.getAbsolutePath}/o_b")
        .mode("overwrite").saveAsTable("o_b")

      val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
        .select("l_orderkey", "l_linenumber", "o_totalprice")
      joined.collect()
      val s = joined.queryExecution.executedPlan.toString
      assert(s.contains("SelectedBucketsCount"), s.take(1500))
      assert(!s.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle: " + s.take(1500))
      // and it is still correct
      assert(joined.count() == Tables(spark, sfDir, "lineitem").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter semi-join reduction: a selective filter on the
  * dim side is turned into a bloom filter applied to the fact side
  * BEFORE the join's shuffle, so the exchange moves only
  * probably-matching rows.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom filter injects on the fact side of a filtered dim join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables(spark, sfDir, "lineitem")
      val ords = Tables(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val opt = joined.queryExecution.optimizedPlan.toString
      // creation side: bloom_filter_agg over the filtered dim keys;
      // application side: might_contain guard on the fact keys
      assert(opt.contains("bloom_filter_agg"), opt.take(4000))
      assert(opt.contains("might_contain"), opt.take(4000))
      // and the rows are identical to the unfiltered join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.collect().toSet == plain.collect().toSet)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}

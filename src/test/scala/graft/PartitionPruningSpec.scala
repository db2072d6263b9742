package graft

import org.apache.spark.sql.functions._

/** Partition pruning: a predicate on a partition column must prune at
  * the file-listing level (PartitionFilters in the scan), not scan
  * everything and filter — the difference between reading 1/N and N/N
  * of a 100 TB table.
  */
class PartitionPruningSpec extends SparkSpec {

  test("partition column predicate prunes the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toFile
    val events = Tables(spark, sfDir, "events")
    events.write.partitionBy("event_type").mode("overwrite")
      .parquet(dir.getAbsolutePath)

    val clicks = spark.read.parquet(dir.getAbsolutePath)
      .filter(col("event_type") === "click")
    clicks.collect()
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("(event_type"), plan.take(1500))
    assert(clicks.count() ==
      events.filter(col("event_type") === "click").count())
  }
}

package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Pipeline observability: `Dataset.observe` metrics ride the SAME
  * action that produces the result — rows seen / kept / dropped come
  * out of the one pass the pipeline already pays for, not from extra
  * `count()` jobs that would re-scan 100 TB once per metric. (The
  * streaming twin — observable watermark late-drops — lives in
  * EventsStream/StreamingSpec.)
  */
class ObservabilitySpec extends SparkSpec {

  test("a curation filter reports seen/kept counts from its own pass") {
    val docs = Tables(spark, sfDir, "documents")
    val seen = Observation("seen")
    val kept = Observation("kept")
    val result = docs
      .observe(seen, count(lit(1)).as("n"),
        sum(length(col("text")).cast("long")).as("chars"))
      .withColumn("tokens", size(expr(Text.wordsExpr("text"))).cast("long"))
      .filter(col("tokens") >= 20L)
      .observe(kept, count(lit(1)).as("n"))
    val out = result.count() // ONE action; both observation points fill
    assert(kept.get("n").asInstanceOf[Long] == out)
    assert(seen.get("n").asInstanceOf[Long] == docs.count())
    assert(seen.get("chars").asInstanceOf[Long] ==
      docs.agg(sum(length(col("text")))).head().getLong(0))
    val dropped = seen.get("n").asInstanceOf[Long] -
      kept.get("n").asInstanceOf[Long]
    assert(dropped >= 0)
  }

  test("observation metrics survive a full pipeline with joins and aggs") {
    val ev = Tables(spark, sfDir, "events")
    val probe = Observation("probe")
    // DISTINCT aggregates are rejected in observed metrics (they'd
    // force a second shuffle into the observation point) — the
    // sketch is the supported shape, consistent with the q48 rollup
    val byType = ev
      .observe(probe, count(lit(1)).as("events_in"),
        approx_count_distinct(col("user_id"), 0.01).as("users_in"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val total = byType.agg(sum("n")).head().getLong(0)
    assert(probe.get("events_in").asInstanceOf[Long] == total)
    val exactUsers = ev.select("user_id").distinct().count()
    val approxUsers = probe.get("users_in").asInstanceOf[Long]
    assert(math.abs(approxUsers - exactUsers).toDouble / exactUsers < 0.05)
  }
}

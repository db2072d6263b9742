package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("contamination counts distinct benchmark n-gram overlaps per doc") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // contains the bench 8-gram starting at "alpha" (and the one at "beta")
      (1L, "x alpha beta gamma delta epsilon zeta eta theta iota y"),
      // same words, wrong order: no 8-gram in common
      (2L, "theta eta zeta epsilon delta gamma beta alpha iota x y"),
      // shorter than n: whole text is the single gram, no match
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, bench, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .select("doc_id", "hit_ngrams", "contaminated")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 2L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  test("contamination keeps zero-hit docs and broadcasts the benchmark side") {
    val docs = Tables(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 50 =!= 7)
    val out = TextAnalysis.contamination(corpus,
      docs.filter(col("doc_id") % 50 === 7), "doc_id", "text", n = 8)
    assert(out.count() == corpus.count(),
      "one output row per corpus doc, hits or not")
    val plan = out.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case b: BroadcastExchangeExec => b
    }.nonEmpty, "benchmark n-gram set must broadcast")
  }
}

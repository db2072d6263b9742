package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Round-18 embedding-side decade measurement (r17 verdict #3): times
  * the cluster-bounded scale-path twins against the exact arms at
  * sf1 → sf10 THROUGH THE OPERATORS, because the twins' scale policy
  * requires the cell count to grow with the corpus — at 32 k vectors
  * the gates' k=8 parameterization means ~4,000-vector cells, which
  * `semanticNearDupPairs`' degenerate-bucket guard REFUSES by design
  * (maxBucket 4096: the guard exists precisely so the "bounded" path
  * can never silently go quadratic). So the decade leg scales k with
  * n (k = corpus/1000, cells ~1,000): Σ cluster² ≈ n²/k stays ∝ n —
  * the linear asymptote the bucket split claims — while the exact
  * arms pay n² regardless.
  *
  * Usage: runMain graft.tools.DecadeEmb <sfDir> <k> [arm]
  * Times semanticNearDupPairs(k) and the qp13-shaped fusion at <k>;
  * with the optional "arm" flag also times the exact all-pairs cosine
  * (qs02's operator) for the same corpus. Two passes each, like
  * TimeQueries.
  */
object DecadeEmb {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DecadeEmb <sfDir> <k> [arm]")
    val dir = args(0)
    val k = args(1).toInt
    val withArm = args.length > 2 && args(2) == "arm"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 2).foreach { p =>
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"[decade] $name%-24s pass$p ${(System.nanoTime() - t0) / 1e9}%8.3f s rows=$n")
      }

    time(s"semantic_neardup_k$k") {
      Dedup.semanticNearDupPairs(Tables(spark, dir, "embeddings"),
        "vec_id", "embedding", k = k, iters = 2, threshold = 0.4)
    }
    time(s"fusion_scale_k$k") {
      val jp = Dedup.ngramJaccardPairsPrefix(Tables(spark, dir, "documents"),
          "doc_id", "text", n = 3, threshold = 0.5)
        .select(col("doc_a"), col("doc_b"))
      val ep = Dedup.semanticNearDupPairs(Tables(spark, dir, "embeddings"),
        "vec_id", "embedding", k = k, iters = 2, threshold = 0.4)
      jp.join(ep,
          jp("doc_a") === ep("vec_a") && jp("doc_b") === ep("vec_b"),
          "full_outer")
        .select(coalesce(col("doc_a"), col("vec_a")).as("id_a"),
          coalesce(col("doc_b"), col("vec_b")).as("id_b"))
    }
    if (withArm) time("embedding_neardup_exact") {
      Dedup.embeddingNearDupPairs(Tables(spark, dir, "embeddings"),
        "vec_id", "embedding", 0.4)
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ivf, Retrieval, Similarity}

/** Scratch tuner (not part of the gate): prints the per-query overlap
  * between the IVF-armed hybrid fused top-10 and the exact-armed one,
  * so the qs23 recall floor can be measured across scale factors.
  * `sbt "runMain graft.tools.HybridTune [sfDir...]"`
  */
object HybridTune {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val docs = Tables(spark, dir, "documents")
      val emb = Tables(spark, dir, "embeddings")
      val queryDocs = docs.filter(col("doc_id") % 100 === 0)
      val queryVecs = emb.filter(col("vec_id") % 100 === 0)
      val lex = Retrieval.bm25PerQueryTopK(docs, "doc_id", "text",
        queryDocs, kArm = 20).localCheckpoint()
      val exactSem = Similarity.cosineTopK(emb, queryVecs,
          "vec_id", "embedding", k = 20)
        .select(col("query_id").as("sqid"), col("neighbor_id").as("sdid"),
          col("rnk").as("rs"))
      val model = Ivf.train(spark, emb, "vec_id", "embedding", k = 8)
      val annSem = Ivf.search(emb, queryVecs, model, "vec_id", "embedding",
          k = 20, nprobe = 4)
        .select(col("query_id").as("sqid"), col("neighbor_id").as("sdid"),
          col("rnk").as("rs"))
      val exactFused = Retrieval.rrfFuse(lex, exactSem, k = 10, rrfK = 60)
      val annFused = Retrieval.rrfFuse(lex, annSem, k = 10, rrfK = 60)
      val semQids = queryVecs.select(col("vec_id").as("query_id"))
      val hits = Similarity.recallHits(
          exactFused.join(semQids, Seq("query_id"))
            .select(col("query_id"), col("doc_id").as("neighbor_id")),
          annFused.select(col("query_id"), col("doc_id").as("neighbor_id")))
        .agg(min(col("hits")), avg(col("hits"))).head()
      println(f"[hybridtune] $dir minHits=${hits.getLong(0)} " +
        f"avgHits=${hits.getDouble(1)}%.2f")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

class PqSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sfDir, "embeddings")

  test("PQ codebooks are bit-identical across input partitionings") {
    // Lloyd means run through DECIMAL(25,6) and assignment ties break to
    // the lowest code; a partition-dependent codebook would make the
    // qs09 recall gate a function of the physical layout
    val m1 = Pq.train(spark, emb.repartition(1), "vec_id", "embedding",
      m = 8, k = 8, iters = 2)
    val m2 = Pq.train(spark, emb.repartition(7, col("vec_id")), "vec_id",
      "embedding", m = 8, k = 8, iters = 2)
    assert(m1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      m2.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("PQ codes: m codes per vector, each inside the codebook") {
    val model = Pq.train(spark, emb, "vec_id", "embedding", m = 8, k = 8,
      iters = 2)
    val codes = Pq.encode(spark, emb, model, "vec_id", "embedding")
    val n = emb.count()
    assert(codes.count() == n * 8, "exactly m code rows per vector")
    assert(codes.groupBy("vid").count().filter(col("count") =!= 8).count() == 0)
    assert(codes.filter(col("ci") < 0 || col("ci") >= 8).count() == 0)
  }

  test("PQ two-stage search recall vs brute force holds the gate floor") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 10)
    val model = Pq.train(spark, emb, "vec_id", "embedding", m = 16, k = 16)
    val ann = Pq.search(spark, emb, q, model, "vec_id", "embedding", k = 10,
      shortlist = 128)
    val hits = Similarity.recallHits(exact, ann)
      .select("hits").collect().map(_.getLong(0))
    // qs09 config measured min hits@10: 9 (sf0.001), 9 (sf0.01),
    // 6 (sf0.1), 3 (sf1, shortlist is a smaller corpus fraction there);
    // the spec corpus is sf0.001 with denser queries
    assert(hits.nonEmpty && hits.min >= 6, s"min hits ${hits.min}")
  }

  test("train fails loud on a corpus smaller than k") {
    val ex = intercept[IllegalArgumentException] {
      Pq.train(spark, emb.limit(4), "vec_id", "embedding", m = 8, k = 8)
    }
    assert(ex.getMessage.contains("at least k vectors"), ex.getMessage)
  }
}

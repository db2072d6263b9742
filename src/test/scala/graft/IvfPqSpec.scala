package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfPq, Pq, Similarity}

class IvfPqSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sfDir, "embeddings")
  private lazy val q = emb.filter(col("vec_id") % 50 === 0)

  test("probing every cell degenerates to plain PQ search exactly") {
    // cell restriction with nprobe = cells is a no-op, so IVF-PQ must
    // reproduce Pq.search row for row (both trainings are
    // deterministic, so the independently-trained codebooks coincide)
    val model = IvfPq.train(spark, emb, "vec_id", "embedding",
      cells = 4, m = 8, k = 8, iters = 2)
    val pqModel = Pq.train(spark, emb, "vec_id", "embedding",
      m = 8, k = 8, iters = 2)
    assert(model.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      pqModel.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val full = IvfPq.search(spark, emb, q, model, "vec_id", "embedding",
      k = 5, nprobe = 4, shortlist = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pq = Pq.search(spark, emb, q, pqModel, "vec_id", "embedding",
      k = 5, shortlist = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == pq)
  }

  test("cell-restricted search holds the recall floor") {
    val model = IvfPq.train(spark, emb, "vec_id", "embedding",
      cells = 8, m = 16, k = 16, iters = 2)
    val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 10)
    val ann = IvfPq.search(spark, emb, q, model, "vec_id", "embedding",
      k = 10, nprobe = 4, shortlist = 128)
    val hits = Similarity.recallHits(exact, ann)
      .select("hits").collect().map(_.getLong(0))
    // qs10 config measured min hits@10: 8/6/4/3 at sf0.001/0.01/0.1/1;
    // the spec corpus is sf0.001 with denser queries
    assert(hits.nonEmpty && hits.min >= 5, s"min hits ${hits.min}")
  }
}

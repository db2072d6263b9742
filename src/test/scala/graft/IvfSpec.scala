package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Similarity}

class IvfSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sfDir, "embeddings")

  test("IVF training is deterministic") {
    val m1 = Ivf.train(spark, emb, "vec_id", "embedding", k = 8, iters = 2)
    val m2 = Ivf.train(spark, emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("IVF centroids are bit-identical across input partitionings") {
    // Lloyd means run through DECIMAL(25,6); plain double avg would be
    // partition-order-dependent in the last ulp and make the qs06
    // recall gate a function of the physical layout
    val m1 = Ivf.train(spark, emb.repartition(1), "vec_id", "embedding",
      k = 8, iters = 2)
    val m2 = Ivf.train(spark, emb.repartition(7, col("vec_id")), "vec_id",
      "embedding", k = 8, iters = 2)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
  }

  test("IVF search recall vs brute force is reasonable") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val k = 10
    val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the qs04/qs06 gate config (8 cells, 4 probes) measured mean
    // hits@10 >= 7.6 at sf0.001/sf0.01
    val model = Ivf.train(spark, emb, "vec_id", "embedding", k = 8, iters = 3)
    val approx = Ivf.search(emb, q, model, "vec_id", "embedding", k, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall@$k was $recall")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables(spark, sfDir, "embeddings")

  test("brute-force top-k returns k deterministic neighbors per query") {
    val q = emb.filter(col("vec_id") % 100 === 0)
    val out = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 5)
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) == 5))
    // determinism: run twice, same result
    val again = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 5)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("LSH top-k recall against brute force is reasonable") {
    val q = emb.filter(col("vec_id") % 50 === 0)
    val k = 10
    val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // these embeddings are near-orthogonal (top-10 sims ~0.3-0.5), so
    // recall needs short hashes and many tables — the qs03/qs05 gate
    // config (3 planes x 24 tables) measured mean hits@10 >= 8 per SF
    val approx = Similarity.lshCosineTopK(emb, q, "vec_id", "embedding", k,
      planesPerTable = 3, tables = 24)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.75, s"LSH recall@$k was $recall")
  }

  test("recallHits counts per-query ANN overlap, zero for missed queries") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    val ann = Seq((1L, 10L), (1L, 99L)).toDF("query_id", "neighbor_id")
    val hits = Similarity.recallHits(exact, ann)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L, 2L -> 0L))
  }

  test("scalar quantization reconstructs every vector within half a level") {
    val out = Similarity.scalarQuantizationBound(emb, "vec_id", "embedding")
    assert(out.count() == emb.count())
    assert(out.filter(!col("within_bound")).isEmpty,
      "all reconstruction errors must sit within step/2")
  }

  test("scalar quantization bound handles constant dimensions") {
    import spark.implicits._
    // dim 1 is constant across the corpus: step = 0, error must be 0
    val tiny = Seq((1L, Seq(0.1f, 5f)), (2L, Seq(0.9f, 5f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.scalarQuantizationBound(tiny, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }

  test("jl projection preserves norms in expectation") {
    import org.apache.spark.sql.functions.{col => c, expr}
    val emb = Tables(spark, sfDir, "embeddings")
    val proj = Similarity.jlProject(emb, "vec_id", "embedding")
    // E[sum_j y_j^2] = JlDims * |x|^2 for Rademacher signs; the
    // corpus-mean ratio should sit near 1 (per-vector variance is large
    // at d_out = 8, the mean over 500 vectors is tight)
    val y2 = proj.select(c("vec_id"),
      (0 until graft.functions.Text.JlDims)
        .map(j => c(s"y$j") * c(s"y$j")).reduce(_ + _).as("ny"))
    val x2 = emb.select(c("vec_id"), expr(
      "aggregate(embedding, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * x)").as("nx"))
    val ratio = y2.join(x2, "vec_id")
      .selectExpr(s"avg(ny / (nx * ${graft.functions.Text.JlDims}))")
      .head().getDouble(0)
    assert(ratio > 0.8 && ratio < 1.2,
      s"norm preservation in expectation violated: mean ratio $ratio")
  }

  test("MIPS ranks by inner product, not angle, and the norm-augmented " +
    "LSH reduction recovers the same order") {
    import spark.implicits._
    import graft.operators.Similarity
    // v2 points 37° off the query but is 10x longer: inner product
    // prefers it (8 > 1) while cosine prefers the aligned unit v1
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(8.0, 6.0)), (3L, Seq(0.5, -0.5)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    def order(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(order(Similarity.mipsTopK(corpus, q, "vec_id", "embedding", 3))
      == Seq(2L, 1L, 3L), "inner product must rank the long vector first")
    assert(order(Similarity.cosineTopK(corpus, q, "vec_id", "embedding", 3))
      == Seq(1L, 2L, 3L), "cosine must rank the aligned unit vector first")
    // augmented-LSH MIPS with enough tables recovers the exact IP order
    assert(order(Similarity.mipsLshTopK(corpus, q, "vec_id", "embedding", 3,
      planesPerTable = 2, tables = 16, dim = 2)) == Seq(2L, 1L, 3L))
  }

  test("mmrRerank trades redundancy for diversity against the plain top-k") {
    import spark.implicits._
    // query (1,0); d2 at -5° is the most relevant, d1 at 10° is the
    // second-most relevant but nearly parallel to d2 (sim .966);
    // d3 is orthogonal (rel 0) and ANTI-similar to d2 (sim -.087).
    // Plain top-2 = (d2, d1); MMR's second pick must be d3:
    //   score(d1) = .5(.9848 - .96592) ≈ .0094
    //   score(d3) = .5(0 - (-.0872))   ≈ .0436
    val emb = Seq(
      (100L, Array(1.0f, 0.0f)),           // the query (100 % 100 == 0)
      (1L, Array(0.9848f, 0.1736f)),
      (2L, Array(0.9962f, -0.0872f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") === 100L), kCand = 3, k = 2)
      .collect()
      .map(r => r.getLong(2) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L)._1 == 2L, "first pick is plain argmax relevance")
    assert(got(1L)._3 == 0.0, "first pick carries zero penalty")
    assert(got(2L)._1 == 3L,
      s"second pick must diversify to the orthogonal doc, got ${got(2L)}")
    // the plain ranking would have returned the near-parallel d1
    val plain = Similarity.cosineTopK(emb,
        emb.filter(col("vec_id") === 100L), "vec_id", "embedding", 2)
      .collect().map(_.getLong(1)).toSeq
    assert(plain == Seq(2L, 1L))
  }

  test("mmrRerank stops early when a query has fewer candidates than k") {
    import spark.implicits._
    // 2 candidates, k = 5: exactly 2 picks, dense ranks 1..2 — the
    // greedy loop must not invent picks or leave gaps
    val emb = Seq(
      (100L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(emb, "vec_id", "embedding",
        queries = emb.filter(col("vec_id") === 100L), kCand = 10, k = 5)
      .collect().map(r => (r.getLong(2), r.getLong(1))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L),
      s"expected dense ranks 1..2 and no phantom picks, got $got")
    assert(got.map(_._2).toSet == Set(1L, 2L))
  }
}

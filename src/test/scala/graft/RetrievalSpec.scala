package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Unit coverage for the retrieval operators: BM25 against hand-computed
  * scores (same double arithmetic as the operator, so equality is exact)
  * and RRF fusion mechanics. Cross-engine exactness itself is gated by
  * qt20/qs17 against the DuckDB oracle.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // The operator's exact scoring chain, reproduced in plain Scala: any
  // drift between this and bm25Term is a real formula change.
  private def bm25(tf: Long, df: Long, dl: Long,
                   nDocs: Long, totDl: Long): Double = {
    val avgdl = totDl.toDouble / nDocs.toDouble
    val idf = ((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5)
    val norm = 0.25 + 0.75 * (dl.toDouble / avgdl)
    idf * (tf.toDouble * 2.2) / (tf.toDouble + 1.2 * norm)
  }

  // 4 docs; terms 'spark' (df=2) and 'vector' (df=3); doc 4 matches
  // nothing and must be absent from the ranking.
  private lazy val docs = Seq(
    (1L, "spark spark vector x"),             // dl=4: tf(spark)=2, tf(vector)=1
    (2L, "vector y y y y y y y"),             // dl=8: tf(vector)=1
    (3L, "spark vector vector"),              // dl=3: tf(spark)=1, tf(vector)=2
    (4L, "nothing here at all")               // dl=4: no query terms
  ).toDF("doc_id", "text")

  test("bm25TopK scores match the hand-computed formula exactly") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "vector"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))

    val n = 4L; val tot = 19L
    def round6(x: Double): Double = // the Exact.dsum decimal(25,6) hop
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = Map(
      1L -> round6(round6(bm25(2, 2, 4, n, tot)) + round6(bm25(1, 3, 4, n, tot))),
      2L -> round6(bm25(1, 3, 8, n, tot)),
      3L -> round6(round6(bm25(1, 2, 3, n, tot)) + round6(bm25(2, 3, 3, n, tot))))

    assert(got.map(_._1).toSet == Set(1L, 2L, 3L), "doc 4 must not rank")
    got.foreach { case (id, score, _) =>
      assert(score == expect(id), s"doc $id: got $score want ${expect(id)}")
    }
    // ranks follow score desc, id asc — and rnk is dense 1..n
    val byRank = got.sortBy(_._3)
    assert(byRank.map(_._3).toSeq == Seq(1L, 2L, 3L))
    assert(byRank.sliding(2).forall {
      case Array(a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
      case _ => true
    })
  }

  test("bm25TopK truncates to k after a full ordering") {
    val one = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "vector"), k = 1).collect()
    assert(one.length == 1 && one.head.getLong(2) == 1L)
  }

  test("hybridRrfTopK fuses both arms and fills missing-arm ranks with 0") {
    // every doc queries (the query frames are the full corpus tables);
    // embeddings: doc 1 ~ doc 3 nearly parallel, doc 2 orthogonal-ish —
    // semantic arm must prefer 3 for query 1 even though the lexical
    // arm is driven by words.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.1f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.9f, 0.0f, 0.1f)),
      (4L, Array(0.1f, 0.9f, 0.2f))
    ).toDF("vec_id", "embedding")
    val got = Retrieval.hybridRrfTopK(docs, "doc_id", "text",
      emb, "vec_id", "embedding", queryDocs = docs, queryVecs = emb,
      kArm = 3, k = 3)
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))

    // every fused row carries a positive rrf and at least one live arm
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, rl, rs, rrf, _) =>
      assert(rl >= 0 && rs >= 0 && (rl > 0 || rs > 0))
      val want = (if (rl > 0) 1.0 / (60.0 + rl) else 0.0) +
        (if (rs > 0) 1.0 / (60.0 + rs) else 0.0)
      assert(rrf == want)
    }
    // doc 4 shares no words: its lexical arm is empty, but it still
    // appears via the semantic arm (rnk_lex = 0)
    val q1 = rows.filter(_._1 == 1L)
    assert(q1.exists(r => r._2 == 4L && r._3 == 0L && r._4 > 0L),
      s"doc 4 must fuse in on the semantic arm alone: ${q1.mkString(", ")}")
    // semantic winner for query 1 is doc 3 (near-parallel vector)
    assert(q1.filter(_._4 == 1L).map(_._2).toSeq == Seq(3L))
    // per-query ranks are dense from 1
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._6).sorted.toSeq == (1L to rs.length).toSeq)
    }
  }

  test("bm25PerQueryTopK is bounded by the explicit query frame") {
    // The bounded-query contract: the query side is the frame the
    // CALLER passes, so growing the corpus must grow the candidate
    // side only — the set of queries (and thus every per-query
    // structure) stays exactly the given frame. This is the structural
    // lock against the r13 shape, where queries were derived as
    // `id % mod` OF THE CORPUS and |queries| grew with the data.
    val queries = docs.filter(col("doc_id").isin(1L, 3L))
    val small = Retrieval.bm25PerQueryTopK(docs, "doc_id", "text",
      queries, kArm = 5)
    assert(small.select("qid").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 3L))

    // corpus 3x the size (shifted copies), SAME query frame: the query
    // set must not grow with the corpus
    val big = docs.unionByName(
        docs.select((col("doc_id") + 100L).as("doc_id"), col("text")))
      .unionByName(
        docs.select((col("doc_id") + 200L).as("doc_id"), col("text")))
    val bigOut = Retrieval.bm25PerQueryTopK(big, "doc_id", "text",
      queries, kArm = 5)
    assert(bigOut.select("qid").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 3L),
      "query set must be the explicit frame, never a function of corpus size")
  }

  test("rrfFuse is a rank-only function of its arms") {
    // Arms that never came from any corpus: fusion must depend on the
    // (id, id, rank) triples alone — this is the pluggability contract
    // qs23 exercises with an IVF arm at the gate level.
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "did", "rl")
    val sem = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("sqid", "sdid", "rs")
    val got = Retrieval.rrfFuse(lex, sem, k = 3, rrfK = 60)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(10L) == ((1L, 0L, 1.0 / 61.0)))
    assert(got(11L) == ((2L, 1L, 1.0 / 62.0 + 1.0 / 61.0)))
    assert(got(12L) == ((0L, 2L, 1.0 / 62.0)))
    // composed operator ≡ rrfFuse over independently built arms (the
    // memoized-arm gates rely on this equivalence)
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.7f, 0.7f)), (4L, Array(0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val composed = Retrieval.hybridRrfTopK(docs, "doc_id", "text",
      emb, "vec_id", "embedding", queryDocs = docs, queryVecs = emb,
      kArm = 3, k = 3)
    val arms = Retrieval.rrfFuse(
      Retrieval.bm25PerQueryTopK(docs, "doc_id", "text", docs, kArm = 3),
      graft.operators.Similarity.cosineTopK(emb, emb, "vec_id", "embedding", 3)
        .select(col("query_id").as("sqid"), col("neighbor_id").as("sdid"),
          col("rnk").as("rs")),
      k = 3)
    assert(composed.collect().toSet == arms.collect().toSet)
  }

  test("bm25TopK tolerates zero-word and no-match documents") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "spark")).toDF("doc_id", "text")
    val r = Retrieval.bm25TopK(df, "doc_id", "text", Seq("spark"), k = 10)
      .collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("evalRanking computes per-query recall and reciprocal rank exactly") {
    // q1: truth {10,11,12}; system ranks 11 at 2, 12 at 5 → hits 2,
    //     recall 2/3, first relevant rank 2 → rr 0.5
    // q2: truth {20}; system never retrieves it → hits 0, rr 0.0
    //     (the query must still emit a row)
    // q3: truth {30,31}; system ranks 30 at 1 → recall 0.5, rr 1.0
    val system = Seq(
      (1L, 99L, 1L), (1L, 11L, 2L), (1L, 98L, 3L), (1L, 97L, 4L), (1L, 12L, 5L),
      (2L, 77L, 1L), (2L, 78L, 2L),
      (3L, 30L, 1L), (3L, 88L, 2L)
    ).toDF("qid", "did", "rl")
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L),
      (3L, 30L), (3L, 31L)).toDF("query_id", "neighbor_id")
    val got = Retrieval.evalRanking(system, "qid", "did", "rl",
        truth, "query_id", "neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == Set(
      (1L, 3L, 2L, 2.0 / 3.0, 0.5),
      (2L, 1L, 0L, 0.0, 0.0),
      (3L, 2L, 1L, 0.5, 1.0)))
  }

  test("rm3 expansion recovers documents the literal query terms miss") {
    import spark.implicits._
    val docs = Seq(
      (100L, "alpha"),                 // the query doc
      (1L, "alpha beta beta"),         // feedback doc: matches alpha
      (2L, "beta beta beta"),          // no alpha - only reachable via expansion
      (3L, "gamma delta")              // unrelated
    ).toDF("doc_id", "text").repartition(2)
    val queries = docs.filter(col("doc_id") === 100L)
    val plain = Retrieval.bm25PerQueryTopK(docs, "doc_id", "text",
      queries, kArm = 10).select("did").as[Long].collect().toSet
    assert(plain == Set(1L), s"literal query reaches only doc 1, got $plain")
    val rm3 = Retrieval.rm3ExpandedTopK(docs, "doc_id", "text", queries,
      fbDocs = 1, fbTerms = 1, k = 10)
    val got = rm3.select("did").as[Long].collect().toSet
    assert(got.contains(2L), s"expansion via 'beta' must recover doc 2: $got")
    assert(!got.contains(100L), "self is excluded")
    assert(!got.contains(3L), "unrelated doc stays unreachable")
    // original terms outweigh expansion terms (weight 2:1): the doc
    // holding the literal query term still ranks first
    val top = rm3.orderBy("rr").select("did").as[Long].head()
    assert(top == 1L, s"doc with the original term must lead, got $top")
    // determinism across partitionings
    val again = Retrieval.rm3ExpandedTopK(docs.repartition(5), "doc_id",
      "text", queries, fbDocs = 1, fbTerms = 1, k = 10)
      .select("did", "rr").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = rm3.select("did", "rr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == first, "rankings must not depend on partitioning")
    // a provided standing arm (any rank-prefix superset) must yield
    // the IDENTICAL expansion — the qt31 gate reuses the shared
    // memoized arm under exactly this equivalence
    val arm = Retrieval.bm25PerQueryTopK(docs, "doc_id", "text",
      queries, kArm = 10)
    val viaArm = Retrieval.rm3ExpandedTopK(docs, "doc_id", "text", queries,
      fbDocs = 1, fbTerms = 1, k = 10, firstPass = Some(arm))
      .select("did", "rr").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaArm == first, "provided first pass must not change the result")
  }
}

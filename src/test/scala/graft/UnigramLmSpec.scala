package graft

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  private def vocabMap(v: org.apache.spark.sql.DataFrame): Map[String, Long] =
    v.select("piece", "cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("trained model is bit-identical across partitionings") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"the cat sat on the mat ${i % 7} banana")).toDF("id", "text")
    val a = vocabMap(UnigramLm.train(docs.repartition(1), "text",
      maxPieceLen = 4, seedSize = 64, targetVocab = 32))
    val b = vocabMap(UnigramLm.train(docs.repartition(7), "text",
      maxPieceLen = 4, seedSize = 64, targetVocab = 32))
    assert(a == b, "piece table must not depend on input partitioning")
  }

  test("EM converges to multi-char pieces and Viterbi uses them") {
    // 'ab' dominates; words longer than maxPieceLen must segment into it
    val docs = Seq.tabulate(5)(i => (i.toLong, "ababab")).toDF("id", "text")
    val vocab = UnigramLm.train(docs, "text", maxPieceLen = 2,
      seedSize = 16, targetVocab = 8)
    val vm = vocabMap(vocab)
    assert(vm.contains("ab"), s"'ab' must survive training, got $vm")
    val enc = UnigramLm.encode(docs, "id", "text", vocab, maxPieceLen = 2)
      .orderBy("id").select("pieces").as[Seq[String]].head()
    assert(enc == Seq("ab", "ab", "ab"),
      s"maximum-probability segmentation of 'ababab' is ab|ab|ab, got $enc")
  }

  test("single-character coverage survives training and keeps encoding lossless") {
    // rare chars whose every occurrence is absorbed into longer pieces
    val docs = Seq((1L, "xyz xyz xyz qq"), (2L, "zz yy xx")).toDF("id", "text")
    val vocab = UnigramLm.train(docs, "text", maxPieceLen = 3,
      seedSize = 8, targetVocab = 4)
    val pieces = vocabMap(vocab).keySet
    for (c <- "xyzq")
      assert(pieces.contains(c.toString), s"char '$c' missing from vocab")
    val enc = UnigramLm.encode(docs, "id", "text", vocab, maxPieceLen = 3)
    val bad = enc.join(docs, Seq("id"))
      .filter(concat_ws("", col("pieces")) =!=
        regexp_replace(col("text"), " ", ""))
      .count()
    assert(bad == 0, "piece concatenation must reproduce the words")
  }

  test("maxPieceLen=1 degenerates to exact character segmentation") {
    val docs = Seq((1L, "hello world")).toDF("id", "text")
    val vocab = UnigramLm.train(docs, "text", maxPieceLen = 1,
      seedSize = 4, targetVocab = 4)
    val enc = UnigramLm.encode(docs, "id", "text", vocab, maxPieceLen = 1)
      .select("n_pieces").as[Long].head()
    assert(enc == "helloworld".length.toLong,
      s"char-only vocab must emit one piece per char, got $enc")
  }

  test("gate invariants hold on the real corpus at sf0.001") {
    val docs = Tables(spark, sfDir, "documents")
    val vocab = UnigramLm.train(docs, "text")
    val enc = UnigramLm.encode(docs, "doc_id", "text", vocab)
    val joined = docs
      .select(col("doc_id"),
        expr(graft.functions.Text.wordsExpr("text")).as("__ws"))
      .join(enc, Seq("doc_id"), "left")
    val broken = joined.filter(
      concat_ws("", coalesce(col("pieces"), array().cast("array<string>")))
        =!= concat_ws("", col("__ws")) ||
      coalesce(col("n_pieces"), lit(0L)) < size(col("__ws")).cast("long"))
      .count()
    assert(broken == 0, s"$broken documents broke the unigram round-trip")
    // the learned model must beat characters: fertility strictly below
    // the mean word length (otherwise EM learned nothing)
    val agg = joined.agg(
      sum(coalesce(col("n_pieces"), lit(0L))).as("p"),
      sum(aggregate(transform(col("__ws"), w => length(w)),
        lit(0L), (a, x) => a + x)).as("c"),
      sum(size(col("__ws")).cast("long")).as("w")).head()
    val (p, c, w) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    assert(p < c, s"pieces ($p) must compress below characters ($c)")
    assert(p >= w, s"pieces ($p) can never undercut words ($w)")
  }

  test("OOV chars under a frozen vocab degrade to character pieces, " +
      "losslessly and deterministically") {
    import spark.implicits._
    // vocab trained WITHOUT 'z' or 'q'; the served batch contains both
    val train = Seq((1L, "hello world hello held")).toDF("id", "text")
    val vocab = UnigramLm.train(train, "text", maxPieceLen = 3,
      seedSize = 16, targetVocab = 16)
    assert(vocab.filter(col("piece") === "z").isEmpty)
    val served = Seq((1L, "hello zq world"), (2L, "zzz")).toDF("id", "text")
    val enc = UnigramLm.encode(served, "id", "text", vocab, maxPieceLen = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // losslessness survives: pieces concatenate back to the words,
    // with the unknown chars emitted as single-character pieces
    assert(enc(1L).mkString == "hellozqworld",
      s"OOV round-trip broke: ${enc(1L)}")
    assert(enc(1L).contains("z") && enc(1L).contains("q"),
      s"unknown chars must surface as their own pieces: ${enc(1L)}")
    assert(enc(2L) == Seq("z", "z", "z"),
      s"an all-OOV word must become its characters: ${enc(2L)}")
    // known words around the OOV keep their trained segmentation: the
    // fallback floor can never outrank a real path
    val alone = UnigramLm.encode(Seq((9L, "hello world")).toDF("id", "text"),
      "id", "text", vocab, maxPieceLen = 3)
      .collect().head.getSeq[String](1)
    val mixed = enc(1L).filterNot(p => p == "z" || p == "q")
    assert(mixed == alone,
      s"OOV chars must not perturb known-word segmentation: $mixed vs $alone")
  }
}

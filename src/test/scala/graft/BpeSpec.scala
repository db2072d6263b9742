package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  // the classic BPE teaching corpus (word freqs: low 5, lower 2,
  // newest 6, widest 3) — first merges are hand-derivable
  private def corpus = {
    import spark.implicits._
    Seq((1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
  }

  test("train learns the hand-derived merges in priority order") {
    // pair counts round 1: es=9, st=9 (tie -> lexicographic (e,s)),
    // lo=7, ow=7, we=8; round 2: est=9; round 3: lo=7 ties ow=7 -> lo
    val merges = Bpe.train(corpus, "text", 3)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o")))
  }

  test("train stops early when no pairs remain") {
    import spark.implicits._
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // one merge collapses 'ab' to a single symbol; no pairs remain
    val merges = Bpe.train(tiny, "text", 10)
    assert(merges == Seq(("a", "b")))
  }

  test("mergeOne applies left-to-right non-overlapping (aab under (a,a))") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", "a", "b"))).toDF("syms")
    val out = df.select(
        Bpe.mergeOne(col("syms"), lit("a"), lit("a")).as("m"))
      .head().getSeq[String](0)
    assert(out == Seq("aa", "b"))
  }

  test("encode tokenizes with learned merges, preserving word order") {
    import spark.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val df = Seq((1L, "lowest low"), (2L, "newest")).toDF("doc_id", "text")
    val out = Bpe.encode(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // lowest: l,o,w,e,s,t -> es -> est -> lo => [lo, w, est]
    assert(out(1L) == Seq("lo", "w", "est", "lo", "w"))
    assert(out(2L) == Seq("n", "e", "w", "est"))
  }

  test("encode of the real corpus conserves characters exactly") {
    val docs = Tables(spark, sfDir, "documents").limit(100)
    val merges = Bpe.train(docs, "text", 12)
    assert(merges.size == 12)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    // concatenating each doc's tokens must reproduce the doc's words
    // with spaces dropped — BPE never creates or destroys characters
    val joined = enc.select(col("doc_id"),
      concat_ws("", col("tokens")).as("glued"))
    val orig = docs.select(col("doc_id"),
      regexp_replace(col("text"), " ", "").as("glued"))
    assert(joined.except(orig).isEmpty && orig.except(joined).isEmpty)
  }

  test("batched training learns the identical merge sequence") {
    // the gate corpus (qt16's documents table): batched passes must
    // reproduce train's one-merge-per-job sequence exactly, in order —
    // the selection rule's equivalence argument, verified end to end
    val docs = Tables(spark, sfDir, "documents")
    val sequential = Bpe.train(docs, "text", 40)
    val batched = Bpe.trainBatched(docs, "text", 40, batch = 8)
    assert(batched == sequential,
      s"diverged at ${batched.zip(sequential).indexWhere(p => p._1 != p._2)}: " +
        s"batched=$batched sequential=$sequential")
    // and on the tie-heavy teaching corpus, including early stop
    val tiny = corpus
    assert(Bpe.trainBatched(tiny, "text", 10, batch = 4) ==
      Bpe.train(tiny, "text", 10))
  }

  test("incremental training learns the identical merge sequence") {
    // the maintained pair table must equal a fresh pairCounts(vocab)
    // at every step (delta patching around the affected subset), so
    // the argmax sequence is train's exactly — on the gate corpus AND
    // the tie-heavy teaching corpus (where a wrong count breaks the
    // lexicographic tiebreak ordering immediately)
    // compactEvery = 7 forces THREE base compactions inside 24 merges
    // (the overlay fold-in is the step a bug would hide in: a word
    // surviving in both base and overlay would double-count pairs and
    // break the argmax order within a few merges)
    val docs = Tables(spark, sfDir, "documents").limit(200)
    val sequential = Bpe.train(docs, "text", 24)
    val incremental = Bpe.trainIncremental(docs, "text", 24, compactEvery = 7)
    assert(incremental == sequential,
      s"diverged at ${incremental.zip(sequential).indexWhere(p => p._1 != p._2)}")
    assert(Bpe.trainIncremental(corpus, "text", 10, compactEvery = 3) ==
      Bpe.train(corpus, "text", 10))
  }

  test("batched training runs fewer passes than merges") {
    // cost model: jobs ∝ passes, and each pass accepts a batch of
    // mutually-independent merges — so the pass COUNT, not wall-clock
    // (which flakes under this host's 10-20x CPU-steal outliers), is
    // the structural claim: 24 merges in strictly fewer than 24
    // pair-count rounds on a corpus with disjoint frequent pairs.
    val docs = Tables(spark, sfDir, "documents").limit(200)
    val batched = Bpe.trainBatched(docs, "text", 24, batch = 8)
    val passes = Bpe.lastBatchedPasses.get()
    assert(batched.size == 24)
    val sequential = Bpe.train(docs, "text", 24)
    assert(batched == sequential)
    assert(passes < 24, s"batched took $passes passes for 24 merges")
  }

  test("self-pair close-out truncates tied unexamined pairs") {
    // regression (round-12 advice): corpus where a self-pair (d,d)
    // closes the batch while a TIED pair (cy,z) sits unexamined after
    // it. Without the close-out boundary the batched walk would emit
    // [(c,y),(d,d),(cy,z)] — a different merge PRIORITY order than
    // sequential's [(c,y),(cy,z),(d,d)], changing tokenization.
    // freqs: 10x"xcyz" -> xc=cy=yz=10; 10x"dd" -> dd=10; all tied,
    // lexicographic order c<d<x<y; round 1 accepts (c,y), rejects
    // nothing, hits the self-pair (d,d)... with (x,c),(y,z) unexamined.
    import spark.implicits._
    val df = Seq((1L, Seq.fill(10)("xcyz").mkString(" ") + " " +
      Seq.fill(10)("dd").mkString(" "))).toDF("doc_id", "text")
    val sequential = Bpe.train(df, "text", 6)
    val batched = Bpe.trainBatched(df, "text", 6, batch = 4)
    assert(batched == sequential,
      s"batched=$batched sequential=$sequential")
  }
}

package graft

import org.apache.spark.sql.functions.col
import graft.operators.TextAnalysis

/** Unit coverage for the PII scrub's ordering and boundary edges — the
  * cross-engine regex semantics themselves are gated by qt11 against
  * the DuckDB oracle.
  */
class TextAnalysisSpec extends SparkSpec {

  private def redactOne(text: String): (String, Long, Long, Long) = {
    import spark.implicits._
    val r = TextAnalysis.redactPii(
      Seq((1L, text)).toDF("id", "text"), "id", "text").head()
    (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("each pattern redacts independently with the right placeholder") {
    val (red, e, i, n) = redactOne(
      "mail a.user+tag@sub.example.org at 192.168.0.1 acct 123456789 done")
    assert(red == "mail <EMAIL> at <IP> acct <NUM> done")
    assert((e, i, n) == ((1L, 1L, 1L)))
  }

  test("digits embedded in words or emails never match the number rule") {
    // 'user123' has no word boundary before the digits; the email is
    // redacted FIRST so its digits can't be re-matched either way
    val (red, e, i, n) = redactOne("ping user123456789@example.com now")
    assert(red == "ping <EMAIL> now")
    assert((e, i, n) == ((1L, 0L, 0L)))
  }

  test("collocations tolerate zero-word documents") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "a b a b a b a b a b a b"))
      .toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.collocations(
      df, "doc_id", "text", minCount = 5, k = 5).collect()
    assert(r.nonEmpty, "the non-empty doc's bigrams must still surface")
  }

  test("short digit runs and dotted short groups are left alone") {
    val (red, e, i, n) = redactOne("v2.3.4 build 123456 of 10.1")
    assert(red == "v2.3.4 build 123456 of 10.1")
    assert((e, i, n) == ((0L, 0L, 0L)))
  }

  test("winnow near-dup pairs find quoted passages, not shared boilerplate") {
    import spark.implicits._
    val quote = "the quick brown fox jumps over the lazy sleeping dog tonight"
    val boiler = "standard footer text appended to every single document here"
    // docs 1 and 2 share the long quote inside otherwise-distinct text;
    // doc 3 is unrelated; ALL docs share the boilerplate footer
    val docs = Seq(
      (1L, s"alpha bravo charlie $quote delta echo $boiler"),
      (2L, s"zulu yankee xray wh $quote victor uniform $boiler"),
      (3L, s"completely different content about ships and harbors $boiler"),
      (4L, s"another unrelated piece on mountain weather patterns $boiler"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.TextAnalysis.winnowNearDupPairs(
        docs, "doc_id", "text", k = 5, w = 4, maxDf = 3, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "the quoted passage must pair 1 and 2")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._2 == 4L),
      s"boilerplate-only overlap must not pair: $pairs")
    // with the exclusion disabled, the shared footer DOES pair everyone —
    // proving the maxDf cut is what kept the boilerplate out
    val loose = graft.operators.TextAnalysis.winnowNearDupPairs(
        docs, "doc_id", "text", k = 5, w = 4, maxDf = 100, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.size > pairs.size, "footer fingerprints should pair without the cap")
  }

  test("textrank matches a hand-computed iteration on a star graph") {
    import spark.implicits._
    // words a b a c a b a c → edges (after minCount=2 + symmetrize):
    // a-b, a-c. deg(a)=2, deg(b)=deg(c)=1. One damped iteration from
    // pr0 = 1e9: pr(a) = 0.15e9 + 2*(1e9*85)//100 = 1_850_000_000,
    // pr(b) = pr(c) = 0.15e9 + (1e9*85)//(100*2) = 575_000_000.
    val df = Seq((1L, "a b a c a b a c")).toDF("doc_id", "text")
    val one = graft.operators.TextAnalysis.textRank(
        df, "doc_id", "text", minCount = 2, iters = 1, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == Map("a" -> 1850000000L, "b" -> 575000000L, "c" -> 575000000L))
    // the hub keeps its lead at the fixpoint depth the gate uses
    val five = graft.operators.TextAnalysis.textRank(
        df, "doc_id", "text", minCount = 2, iters = 5, k = 1).collect()
    assert(five.head.getString(0) == "a")
  }

  test("foldedKey: NFC-composes then folds accents; expansions expand") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val pre = "Caf\u00e9 cr\u00e8me"          // precomposed
    val dec = "Cafe\u0301 cre\u0300me"        // decomposed twin
    val rows = Seq((1L, pre), (2L, dec), (3L, "Stra\u00dfe"),
      (4L, "\u00c6sop \u0153uvre"), (5L, "plain"))
      .toDF("id", "t")
      .select(col("id"), TextAnalysis.foldedKey(col("t")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) == "Cafe creme")
    assert(rows(2L) == rows(1L), "decomposed twin must collapse onto precomposed")
    assert(rows(3L) == "Strasse")
    assert(rows(4L) == "AEsop oeuvre")
    assert(rows(5L) == "plain")
    // fold table sanity: translate source/target same length
    assert(TextAnalysis.FoldFrom.length == TextAnalysis.FoldTo.length)
  }

  test("canonicalUrl: disguised variants collapse, distinct pages stay apart") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val urls = Seq(
      (1L, "https://www.example.com/articles/7?a=1&b=2"),
      (2L, "HTTPS://WWW.EXAMPLE.COM:443/articles/7/?b=2&a=1#sec"),
      (3L, "https://example.com/articles/7?b=2&utm_campaign=x&a=1"),
      (4L, "http://example.com:80/articles/7?a=1&b=2"),   // scheme differs
      (5L, "https://example.com/articles/8?a=1&b=2"),     // page differs
      (6L, "https://example.com"),                        // empty path -> /
      (7L, "https://example.com/?utm_source=x"))          // all-utm query dropped
      .toDF("id", "u")
      .select(col("id"), TextAnalysis.canonicalUrl(col("u")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(urls(1L) == "https://example.com/articles/7?a=1&b=2")
    assert(urls(2L) == urls(1L) && urls(3L) == urls(1L),
      "case/port/www/slash/fragment/param-order/utm variants must collapse")
    assert(urls(4L) == "http://example.com/articles/7?a=1&b=2")
    assert(urls(5L) != urls(1L))
    assert(urls(6L) == "https://example.com/")
    assert(urls(7L) == "https://example.com/")
  }

  test("prefix-filtered sparse cosine equals the exact inverted index") {
    import spark.implicits._
    // near-dup pairs, a disjoint doc, a hot term ('the') shared by all,
    // and a zero-word doc — the shapes the prefix lemma must survive;
    // threshold 0.6 keeps borderline pairs in play (t² = 0.36 makes
    // multi-term prefixes, exercising the tail-mass rule beyond the
    // trivial 1-term prefix t = 0.95 usually yields)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "entirely different words about spark engines"),
      (5L, "the the the the the"),
      (6L, "   "),
      (7L, "spark engines entirely about different words")).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    for (t <- Seq(0.6, 0.95)) {
      val exact = TextAnalysis.sparseCosinePairs(
        docs, "doc_id", "text", k = 3, minSim = t).collect().map(key).toSet
      val pref = TextAnalysis.sparseCosinePairsPrefix(
        docs, "doc_id", "text", k = 3, minSim = t).collect().map(key).toSet
      assert(pref == exact,
        s"t=$t: prefix ${pref.size} pairs vs exact ${exact.size}")
      assert(exact.nonEmpty, s"t=$t: degenerate test — no qualifying pairs")
    }
  }

  test("tokenizerFertility sums exact token counts per (label, predicted)") {
    import spark.implicits._
    // 'the a' -> en stopwords, predicted en; words cost ceil(len/4)=1
    // token each. doc 3's label disagrees with its predicted lang.
    val df = Seq(
      (1L, "en", "the a and of"),          // 4 words, 4 bpe tokens
      (2L, "en", "the the abcdefghijklmnopq"), // 3 words, 1+1+ceil(17/4)=7
      (3L, "de", "the a")                  // labeled de, predicted en
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis
      .tokenizerFertility(df, "doc_id", "text", groupCols = Seq("lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got(("en", "en")) == ((2L, 7L, 11L, 11.0 / 7.0)))
    assert(got(("de", "en")) == ((1L, 2L, 2L, 1.0)),
      "label/prediction disagreement must surface as its own row")
  }

  test("tokenizerFertility guards the zero-word group to fertility 0.0") {
    import spark.implicits._
    // a group whose only documents tokenize to zero words: the ratio's
    // denominator is 0 and an unguarded division would be NULL in
    // Spark but engine-defined elsewhere — the guard pins it to 0.0
    val df = Seq(
      (1L, "xx", ""),
      (2L, "xx", "   "),
      (3L, "en", "the a")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis
      .tokenizerFertility(df, "doc_id", "text", groupCols = Seq("lang"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getDouble(5)))).toMap
    assert(got("xx")._1 == 0L)
    assert(got("xx")._2 == 0.0, "zero-word group must report fertility 0.0")
    assert(got("en")._2 == 1.0)
  }

  test("vocabCoverage ranks by frequency then word, and clamps past the vocab") {
    import spark.implicits._
    // counts: x:4, b:3, a:2, z:1 — ties impossible here except via the
    // word tie-break exercised by (a=2 vs the would-be c=2 absent)
    val df = Seq((1L, "x x b a"), (2L, "x b z a"), (3L, "x b")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(df, "text", ns = Seq(1, 2, 10))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((4L, 10L, 0.4)))       // top-1 = x
    assert(got(2L) == ((7L, 10L, 0.7)))       // + b
    assert(got(10L) == ((10L, 10L, 1.0)))     // clamp: whole vocab
  }
}

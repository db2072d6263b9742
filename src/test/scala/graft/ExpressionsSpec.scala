package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** PolyHash / DotProduct: interpreted vs codegen agreement and
  * reference-implementation equality.
  */
class ExpressionsSpec extends SparkSpec {

  private def refPolyHash(s: String): Long = {
    var h = 7L
    s.codePoints().forEach(cp => h = (h * 31L + cp) % 1000000007L)
    h
  }

  test("polyhash matches reference implementation on sample strings") {
    import spark.implicits._
    val samples = Seq("hello", "a", "the quick brown fox", "x y z", "0123456789")
    val got = samples.toDF("s")
      .select(Text.polyhash(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == samples.map(refPolyHash))
  }

  test("polyhash is null-safe and codegen/interpreted agree") {
    import spark.implicits._
    val df = Seq(Some("abc"), None, Some("")).toDF("s")
    // codegen path (projection) vs interpreted path (filter eval)
    val viaProject = df.select(Text.polyhash(col("s")).as("h")).collect()
    assert(viaProject.map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq ==
      Seq(refPolyHash("abc"), -1L, 7L))
  }

  test("dot product matches manual computation") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(Text.dot(col("a"), col("b"))).head().getDouble(0)
    assert(got == 32.0)
  }

  test("dot product against testdata embeddings equals HOF fold") {
    val emb = Tables(spark, sfDir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
      .limit(50)
    val both = emb.select(
      Text.dot(col("v"), col("v")).as("fast"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, x) -> a + x)")
        .as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
  }

  // ---- Jaro-Winkler: DuckDB-pinned textbook values and edge cases ----

  private val jwCases = Seq(
    // classic record-linkage pairs (values printed by DuckDB's
    // jaro_winkler_similarity — the oracle this expression must match)
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("hello", "hallo", 0.88),
    // boost threshold: jaro = 0.6 with a 4-char common prefix must
    // NOT get the Winkler boost (threshold is jaro > 0.7)
    ("abcdxxxxxx", "abcdyyyyyy", 0.6),
    // prefix cap at 4 (not 9): jaro = 0.9333..., jw = 0.96
    ("aaaaaaaaaa", "aaaaaaaaab", 0.96),
    // match window floor: max(2,2)/2-1 = 0, so transposed bigrams
    // share no in-window matches at all
    ("ab", "ba", 0.0),
    // either side empty -> 0 (INCLUDING both empty — DuckDB semantics)
    ("", "", 0.0),
    ("abc", "", 0.0),
    ("abc", "abc", 1.0),
    ("x", "x", 1.0),
    ("a", "b", 0.0),
    // non-ASCII: DuckDB compares UTF-8 BYTES, and so does the kernel
    // (round-17 fix — the old UTF-16-char kernel diverged on ALL
    // non-ASCII, e.g. 'éa'/'éb' = 0.667 by chars vs DuckDB's 0.822).
    // Values printed by duckdb.jaro_winkler_similarity this round:
    ("éa", "éb", 0.8222222222222222), // precomposed U+00E9
    ("café", "cafe", 0.8483333333333334),
    ("e\u0301a", "e\u0301b", 0.8833333333333334), // NFD-decomposed e + combining acute
    ("日本語", "日本誤", 0.9555555555555556),
    // astral plane (U+1D11E, 4 UTF-8 bytes / a UTF-16 surrogate pair)
    ("𝄞abc", "𝄞abd", 0.9428571428571428))

  test("jaro-winkler matches DuckDB-pinned values (codegen path)") {
    import spark.implicits._
    val got = jwCases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(Text.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    jwCases.map(_._3).zip(got).foreach { case (want, g) =>
      assert(math.abs(g - want) < 1e-12, s"want $want got $g")
    }
  }

  private def jwKernel(a: String, b: String): Double =
    graft.expressions.JaroWinklerSim.compute(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("jaro-winkler kernel and expression agree; null-safe") {
    import spark.implicits._
    // expression (codegen) result is bit-identical to the kernel
    val viaDf = jwCases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(Text.jaroWinkler(col("a"), col("b"))).collect()
      .map(_.getDouble(0)).toSeq
    assert(viaDf == jwCases.map { case (a, b, _) => jwKernel(a, b) })
    // symmetry of the kernel (greedy matching is order-symmetric in m/t)
    Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("hello", "hallo"))
      .foreach { case (a, b) =>
        assert(jwKernel(a, b) == jwKernel(b, a))
      }
    val df = Seq((Some("abc"), Some("abd")), (None, Some("x")),
      (Some("x"), None)).toDF("a", "b")
    val rows = df.select(Text.jaroWinkler(col("a"), col("b"))).collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0) && rows(2).isNullAt(0))
  }

  test("jaro-winkler rejects non-string input at analysis time") {
    import spark.implicits._
    // ADVICE r16: without ExpectsInputTypes, graft_jaro_winkler(1, 2)
    // passed analysis and exploded at runtime (janino / ClassCast).
    val df = Seq((1, 2)).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Text.jaroWinkler(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  // CODEPOINT-mode expectations, HAND-COMPUTED (the same algorithm run
  // over codepoint arrays). DuckDB CANNOT oracle this mode — its
  // jaro_winkler_similarity compares UTF-8 bytes (measured round 17)
  // — so these constants ARE the spec: ASCII agrees with byte mode
  // bit-for-bit, and every multi-byte pair diverges in the INTENDED
  // direction (é is ONE unit in NFC, 'e'+combining-acute is TWO in
  // NFD, a CJK character is one unit, an astral codepoint is one unit
  // rather than four bytes / a surrogate pair).
  private val jwCpCases = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("éa", "éb", 0.6666666666666666), // 2 units, window 0 -> no boost
    ("éa", "éb", 0.8222222222222222), // NFD: 3 units, l=2
    ("日本語", "日本誤", 0.8222222222222222), // 3 units, l=2
    ("𝄞abc", "𝄞abd", 0.8833333333333334)) // 4 units, l=3

  test("codepoint-mode jaro-winkler matches hand-computed values and " +
      "diverges from byte mode exactly on multi-byte codepoints") {
    import spark.implicits._
    val got = jwCpCases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(Text.jaroWinklerCp(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0)).toSeq
    jwCpCases.map(_._3).zip(got).foreach { case (want, g) =>
      assert(math.abs(g - want) < 1e-12, s"want $want got $g")
    }
    jwCpCases.foreach { case (a, b, want) =>
      val byByte = jwKernel(a, b)
      if (a.forall(_ < 128) && b.forall(_ < 128))
        assert(byByte == want, s"ASCII must agree across modes: $a/$b")
      else
        assert(math.abs(byByte - want) > 1e-3,
          s"modes must diverge on $a/$b: byte=$byByte cp=$want")
    }
    // null-safety and analysis-time typing match the byte sibling
    val nulls = Seq((Some("abc"), Some("abd")), (None, Some("x")))
      .toDF("a", "b")
      .select(Text.jaroWinklerCp(col("a"), col("b"))).collect()
    assert(!nulls(0).isNullAt(0) && nulls(1).isNullAt(0))
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(Text.jaroWinklerCp(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Jaro-Winkler similarity of two string columns — the
  * record-linkage scorer Spark lacks natively (it ships levenshtein
  * but no Jaro family), implemented as a Catalyst Expression so the
  * verify step of a blocked entity-match join stays inside whole-stage
  * codegen instead of paying a UDF serialization boundary per
  * candidate pair.
  *
  * Semantics are the textbook Winkler variant, pinned empirically
  * against DuckDB's jaro_winkler_similarity (the oracle engine) on
  * the classic pairs (MARTHA/MARHTA = 0.9611…, DIXON/DICKSONX =
  * 0.8133…) plus the edge cases that distinguish implementations:
  *  - either side empty → 0.0 (including both empty),
  *  - match window = max(len)/2 - 1, floored at 0 (so "ab"/"ba" = 0),
  *  - transpositions counted as half the differing matched positions,
  *  - prefix boost l·0.1·(1-jaro) with l capped at 4, applied only
  *    when jaro > 0.7 (the Winkler boost threshold — verified active
  *    in DuckDB: jaro=0.6 with a 4-char common prefix stays 0.6).
  *
  * The scorer is exact double arithmetic from small integer counts
  * (m, t, lengths), so cross-engine agreement holds to the last ulp
  * in practice; gate outputs still round to integer micro-units
  * (floor(x·1e6 + 0.5)) so a last-ulp libm-style divergence can never
  * flip a hash — the same discipline as the seeded-noise release.
  *
  * Comparison is per UTF-8 BYTE, which is exactly what DuckDB's
  * jaro_winkler_similarity compares (measured round 17: precomposed
  * 'éa'/'éb' → 0.8222…, NFD-decomposed → 0.8833…, '日本語'/'日本誤'
  * → 0.9556…, astral '𝄞abc'/'𝄞abd' → 0.9429… — all reproduced
  * byte-for-byte by this kernel, all divergent from a UTF-16-char or
  * codepoint kernel). Byte iteration also skips the UTF-16 decode the
  * previous char-based kernel paid per row. Note the semantic trade:
  * a multi-byte codepoint can half-match (its bytes straddling the
  * window), which a codepoint-level scorer would never do — acceptable
  * here because the oracle IS the byte-level engine; consumers that
  * need linguistically-meaningful scoring use the CODEPOINT sibling
  * [[JaroWinklerSimCp]] instead.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Analysis-time typing (ADVICE r16): without this check,
    * graft_jaro_winkler(1, 2) passed analysis and failed at runtime
    * (ClassCastException interpreted, janino error codegen'd).
    */
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler needs (STRING, STRING) input types, got " +
          s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.compute(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinklerSim.compute($a.getBytes(), $b.getBytes())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

/** Jaro-Winkler similarity compared per Unicode CODEPOINT — the
  * linguistically-meaningful sibling of [[JaroWinklerSim]] (r17
  * verdict #6): a multi-byte codepoint either matches whole or not at
  * all, so 'é'-vs-'é' is one unit, a CJK character is one unit and an
  * astral codepoint is one unit (never a surrogate pair). This is the
  * mode a human-name matcher over non-Latin scripts wants; the BYTE
  * sibling is the oracle-exact mode (DuckDB compares UTF-8 bytes —
  * measured), so THIS expression is deliberately NOT DuckDB-gateable:
  * its semantics are pinned in ExpressionsSpec against hand-computed
  * values on the same measured pairs, showing the INTENDED divergence
  * (codepoint 0.6667 vs byte 0.8222 on NFC 'éa'/'éb', 0.8222 vs
  * 0.9556 on 日本語/日本誤, 0.8833 vs 0.9429 on the astral pair;
  * identical on ASCII). Decoding pays one UTF-16 transcode per row —
  * acceptable for a deliberate-semantics mode; the hot blocked-match
  * path stays on the byte kernel.
  */
case class JaroWinklerSimCp(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler_cp needs (STRING, STRING) input types, got " +
          s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.computeCp(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinklerSim.computeCp($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimCp =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** Codepoint-mode kernel ([[JaroWinklerSimCp]]): identical algorithm,
    * comparison unit = Unicode codepoint.
    */
  def computeCp(a: UTF8String, b: UTF8String): Double =
    computeInts(a.toString.codePoints().toArray,
      b.toString.codePoints().toArray)

  /** The shared algorithm over integer comparison units (codepoints).
    * Kept separate from the byte kernel below so the hot byte path
    * never pays a widening copy.
    */
  private def computeInts(s1: Array[Int], s2: Array[Int]): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1(i) == s2(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var diff = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1(i) != s2(k)) diff += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / len1 + md / len2 + (md - diff / 2.0) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(len1, len2))
      while (l < maxL && s1(l) == s2(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Static kernel shared by interpreted eval and generated code (the
    * RegExpExtract pattern: one tight JVM method, codegen emits a
    * call, whole-stage fusion is preserved around it). Operates on the
    * raw UTF-8 bytes — DuckDB's exact comparison unit (scaladoc above).
    */
  def compute(s1: Array[Byte], s2: Array[Byte]): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1(i) == s2(j)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: differing positions between the two matched
    // subsequences, halved (may be fractional in the halved form;
    // the differing count itself is what we accumulate).
    var k = 0
    var diff = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1(i) != s2(k)) diff += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / len1 + md / len2 + (md - diff / 2.0) / md) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val maxL = math.min(4, math.min(len1, len2))
      while (l < maxL && s1(l) == s2(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

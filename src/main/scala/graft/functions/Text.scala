package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

import graft.expressions.{DotProduct, PolyHash}

/** Shared text/vector primitives for the training-data-pipeline
  * operators, each with its DuckDB-SQL mirror so the oracle computes the
  * IDENTICAL value (single source of truth for the constants).
  *
  * Tokenization spec (both engines): words = split on single space,
  * drop empties. Shingles = distinct word n-grams joined by one space;
  * a doc with fewer than n words contributes its whole word sequence as
  * one shingle.
  */
object Text {
  val Mod: Long = PolyHash.Mod
  val Mult: Long = PolyHash.Mult
  val Seed: Long = PolyHash.Seed

  /** Minhash permutation constants: perm_i(h) = (a_i*h + b_i) mod Mod. */
  def permA(i: Column): Column = lit(37L) + lit(2L) * i
  def permB(i: Column): Column = lit(17L) + lit(101L) * i
  def permSqlA(i: String): String = s"(37 + 2 * $i)"
  def permSqlB(i: String): String = s"(17 + 101 * $i)"

  /** Rolling polynomial hash (custom codegen'd Catalyst expression). */
  def polyhash(c: Column): Column =
    GraftColumnBridge.column(PolyHash(GraftColumnBridge.expression(c)))

  /** DuckDB mirror of polyhash: fold over code points. */
  def polyhashSql(expr: String): String =
    s"list_reduce(list_prepend(CAST($Seed AS BIGINT), " +
      s"list_transform(string_split($expr, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(a, b) -> (a * $Mult + b) % $Mod)"

  /** Dot product over ArrayType(DoubleType) (custom codegen'd expr). */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** SpaceSaving heavy-hitter summary (TypedImperativeAggregate). */
  def spaceSavingTopK(c: Column, capacity: Int, k: Int): Column =
    GraftColumnBridge.column(
      graft.expressions.SpaceSavingTopK(GraftColumnBridge.expression(c), capacity, k)
        .toAggregateExpression())

  /** Non-empty words of a text column. */
  def wordsExpr(textCol: String): String =
    s"filter(split($textCol, ' '), w -> w != '')"
  def wordsSql(textCol: String): String =
    s"list_filter(string_split($textCol, ' '), w -> w != '')"

  /** ALL word n-grams of a words-array column (with multiplicity —
    * repetition analysis needs the duplicates; `shinglesExpr` is the
    * distinct set). Documents shorter than `n` words yield their whole
    * text as one gram.
    *
    * Deliberately built as a zip_with-of-slices chain rather than
    * `transform(sequence(...), i -> element_at(ws, i...))`: after
    * CollapseProject inlines the words expression, element_at inside a
    * lambda re-evaluates the whole split/filter once PER ELEMENT
    * (O(words^2) per row — measured 10x slowdown at sf0.1), while
    * slices and zip_with evaluate their inputs once per row.
    */
  def ngramsExpr(ws: String, n: Int = 3): String = {
    val zipped = (2 to n).foldLeft(ws) { (acc, j) =>
      s"zip_with($acc, slice($ws, $j, size($ws)), (a, b) -> concat(a, ' ', b))"
    }
    s"""CASE WHEN size($ws) >= $n
       |  THEN filter($zipped, x -> x IS NOT NULL)
       |  ELSE array(array_join($ws, ' ')) END""".stripMargin
  }
  def ngramsSql(ws: String, n: Int = 3): String = {
    val joined = (0 until n).map(j => s"$ws[i + $j]").mkString(" || ' ' || ")
    s"""CASE WHEN len($ws) >= $n
       |  THEN list_transform(range(1, len($ws) - ${n - 2}), i -> $joined)
       |  ELSE [array_to_string($ws, ' ')] END""".stripMargin
  }

  def shinglesExpr(ws: String, n: Int = 3): String =
    s"array_distinct(${ngramsExpr(ws, n)})"
  def shinglesSql(ws: String, n: Int = 3): String =
    s"list_distinct(${ngramsSql(ws, n)})"

  /** Stopword lists for the n-gram language-ID heuristic. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "zu", "von"),
    "es" -> Seq("el", "los", "y", "de", "un", "una", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "de", "une", "est", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  def stopwordCountExpr(ws: String, lang: String): String = {
    val list = Stopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    s"size(filter($ws, w -> w IN ($list)))"
  }
  def stopwordCountSql(ws: String, lang: String): String = {
    val list = Stopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter($ws, w -> w IN ($list)))"
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash over a string's code points:
  * h = seed; for cp in codepoints: h = (h * mult + cp) % mod.
  *
  * This is the shared hash primitive for the training-data-pipeline
  * operators (minhash shingle hashing, simhash word hashing, document
  * fingerprinting — graft.operators.Dedup / TextAnalysis). A native
  * Expression with doGenCode rather than a Scala UDF so it stays inside
  * whole-stage codegen on the 100 TB hot path (no boxing, no
  * serialization of a closure per row).
  *
  * The exact recurrence is deliberately engine-portable — the DuckDB
  * oracle reproduces it with list_reduce over unicode() code points
  * (graft.functions.Text.polyhashSql), so hashed operators are
  * hash-compared exactly, not just rows-counted. Note: hashing the empty
  * string yields `seed` here but DuckDB's string_split('','') yields
  * [''] with unicode('') = -1 — callers must not hash empty strings
  * (filter empty words first).
  */
case class PolyHash(
    child: Expression,
    seed: Long = PolyHash.Seed,
    mult: Long = PolyHash.Mult,
    mod: Long = PolyHash.Mod)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * mult + cp) % mod
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = ${seed}L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $h = ($h * ${mult}L + $cp) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Seed = 7L
  val Mult = 31L
  val Mod = 1000000007L
}

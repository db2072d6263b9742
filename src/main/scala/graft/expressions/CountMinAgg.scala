package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.functions.Text

/** Count-Min sketch over PRE-HASHED values (a long column, e.g.
  * [[PolyHash]] output) as a TypedImperativeAggregate: `depth` rows of
  * `width` counters, update increments one counter per row at position
  * `((a_i*h + b_i) mod P) mod width`, merge is element-wise sum, eval
  * emits the row-major flattened counters as array<long>.
  *
  * The per-row position uses the SAME shared affine-permutation
  * constants as the minhash family ([[Text.PermAs]]/[[Text.PermBs]] —
  * mixer-derived, structureless in the row index), so a query-side
  * estimate is a plain SQL `least(...)` over the flattened array with
  * no re-implemented hashing: [[CountMinAgg.estimateExpr]] builds it.
  *
  * Counter sums are order-independent, so the sketch is IDENTICAL
  * under any partitioning (spec-asserted) — the mergeable-rollup
  * property that lets per-day sketches answer any range by summation,
  * the q54 HLL architecture with frequencies instead of cardinality.
  * Deterministic guarantees: estimates never underestimate; the min
  * over `depth` independent rows keeps overestimates near N/width.
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(width > 0 && depth >= 1 && depth <= Text.MaxPerms,
    s"need 1..${Text.MaxPerms} rows and positive width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](width * depth)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        b(i * width + CountMinAgg.pos(h, i, width)) += 1L
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = BloomAgg.toBytes(b)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomAgg.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
    copy(child = c.head)
}

object CountMinAgg {

  /** Row-i counter position of hash `h` — shared by executor update and
    * the SQL estimate expression.
    */
  def pos(h: Long, i: Int, width: Int): Int =
    (((Text.PermAs(i) * h + Text.PermBs(i)) % Text.Mod) % width).toInt

  /** Spark SQL text estimating the count of pre-hashed value `h` from a
    * flattened sketch column `sketch`: the minimum across rows of the
    * addressed counters (1-based element_at).
    */
  def estimateExpr(sketch: String, h: String, width: Int, depth: Int): String = {
    val terms = (0 until depth).map { i =>
      s"element_at($sketch, $i * $width + " +
        s"CAST((( ${Text.PermAs(i)}L * $h + ${Text.PermBs(i)}L) % ${Text.Mod}L) % $width AS INT) + 1)"
    }
    if (terms.size == 1) terms.head else s"least(${terms.mkString(", ")})"
  }
}

package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact per-group top-k as a mergeable bounded-buffer aggregate — the
  * scale-path alternative to the ROW_NUMBER window idiom (SURVEY.md
  * §2.5/§2.6). A window top-k shuffles EVERY row to its group's
  * partition and sorts the whole group; this aggregate keeps at most
  * `k` (value, id) pairs per group per partition, so the map side
  * prunes before the shuffle and the exchange carries ≤ k·|groups|
  * rows regardless of input size — the difference between sorting
  * 100 TB and shuffling kilobytes. Exactness: top-k is a commutative,
  * mergeable summary (merge-then-truncate of two per-partition top-k
  * buffers equals the top-k of the union), proven partition-invariant
  * in GroupTopKSpec.
  *
  * Ordering contract: larger `value` wins; ties break toward the
  * SMALLER `id` (row_number ... ORDER BY value DESC, id ASC). Rows
  * with a NULL value or id are skipped — the window idiom places
  * NULLs deterministically only under an explicit NULLS clause, and a
  * ranked NULL measure is meaningless. NaN values are skipped for the
  * same reason: IEEE comparisons make NaN outrank nothing (it could
  * still slip into an under-filled board), while Spark's DESC sort
  * places NaN FIRST — no single board behavior could match both, so a
  * NaN measure is excluded rather than ranked arbitrarily.
  *
  * eval returns array<struct<value:double, id:bigint>> sorted best
  * first; posexplode() upstairs turns position into the rank.
  */
case class GroupTopK(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k >= 1, s"GroupTopK needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(value, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  // (v1,i1) outranks (v2,i2): higher value, or same value and lower id
  private def outranks(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def update(
      b: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v == null || i == null) return b
    val d = v.asInstanceOf[Double]
    if (d.isNaN) return b
    val x = (d, i.asInstanceOf[Long])
    if (b.size < k) { b += x; return b }
    // full: replace the current worst only if x outranks it (O(k) scan —
    // k is a handful; the win is rows never leaving the partition)
    var worst = 0
    var j = 1
    while (j < b.size) { if (outranks(b(worst), b(j))) worst = j; j += 1 }
    if (outranks(x, b(worst))) b(worst) = x
    b
  }

  override def merge(
      a: ArrayBuffer[(Double, Long)], b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    a ++= b
    if (a.size > k) {
      val kept = a.sortWith(outranks).take(k)
      a.clear()
      a ++= kept
    }
    a
  }

  override def eval(b: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(
      b.sortWith(outranks).take(k).map { case (v, i) => InternalRow(v, i) })

  override def serialize(b: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (v, i) => out.writeDouble(v); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = ArrayBuffer.empty[(Double, Long)]
    (1 to n).foreach(_ => b += ((in.readDouble(), in.readLong())))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GroupTopK =
    copy(value = c(0), id = c(1))
}

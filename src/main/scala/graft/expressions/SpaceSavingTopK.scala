package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters as a TypedImperativeAggregate — the
  * binary-buffer aggregation surface (SURVEY.md §7.3): the summary
  * lives as a plain Scala map per partition, serialized once per
  * partition at shuffle time, not per row.
  *
  * Classic Metwally et al. semantics: at most `capacity` counters; an
  * unseen item evicts the minimum counter and inherits its count + 1
  * (an overestimate). Merge sums per-item estimates and re-truncates.
  * Guarantee (tested in SketchesSpec): any item with true frequency
  * > n/capacity appears in the summary. Estimates depend on partition
  * order, so the operator is gated rows-only — the deterministic
  * guarantee, not the exact estimates, is the contract.
  *
  * eval returns array<struct<value:string, est:bigint>> — the top `k`
  * by (estimate desc, value asc).
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.Map[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("est", LongType))))

  override def createAggregationBuffer(): mutable.Map[String, Long] =
    mutable.Map.empty

  override def update(b: mutable.Map[String, Long], input: InternalRow): mutable.Map[String, Long] = {
    val v = child.eval(input)
    if (v == null) return b
    val s = v.toString
    if (b.contains(s)) b(s) += 1L
    else if (b.size < capacity) b(s) = 1L
    else {
      val (minK, minV) = b.minBy { case (key, n) => (n, key) }
      b.remove(minK)
      b(s) = minV + 1L
    }
    b
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (s, n) => a(s) = a.getOrElse(s, 0L) + n }
    if (a.size > capacity) {
      val keep = a.toSeq.sortBy { case (s, n) => (-n, s) }.take(capacity)
      a.clear()
      keep.foreach { case (s, n) => a(s) = n }
    }
    a
  }

  override def eval(b: mutable.Map[String, Long]): Any =
    new GenericArrayData(
      b.toSeq.sortBy { case (s, n) => (-n, s) }.take(k)
        .map { case (s, n) =>
          InternalRow(UTF8String.fromString(s), n)
        })

  override def serialize(b: mutable.Map[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (s, n) => out.writeUTF(s); out.writeLong(n) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.Map[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.Map.empty[String, Long]
    (1 to n).foreach(_ => m(in.readUTF()) = in.readLong())
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = c.head)
}

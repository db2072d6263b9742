package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Fixed-size Bloom filter as a TypedImperativeAggregate: the buffer is
  * a bit array of `bits` bits (a long-word array per group), update
  * sets `hashes` positions per value, merge is a word-wise OR, eval
  * emits the packed bytes. Constant-size per group by construction —
  * the per-(file, column) membership summary the bloom manifest
  * persists is metadata-scale no matter the file's cardinality.
  *
  * Hashing is double hashing over a 64-bit FNV-1a base of the value's
  * canonical bytes (integrals as their 8-byte two's complement,
  * strings as UTF-8), with the two derived hashes drawn from splitmix
  * mixes of the base — the [[graft.functions.Text]] mixer discipline.
  * [[BloomAgg.mightContain]] replays the identical math driver-side,
  * which is what makes the persisted bytes queryable during file
  * pruning without any executor involvement.
  */
case class BloomAgg(
    child: Expression,
    bits: Int,
    hashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits % 64 == 0 && bits > 0, "bits must be a positive multiple of 64")
  require(hashes >= 1 && hashes <= 16, "1..16 hash functions")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](bits / 64)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomAgg.add(b, bits, hashes, BloomAgg.canonicalBytes(v))
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any = BloomAgg.toBytes(b)

  override def serialize(b: Array[Long]): Array[Byte] = BloomAgg.toBytes(b)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomAgg.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c.head)
}

object BloomAgg {

  /** Canonical bytes of a value, identical for the executor-side
    * Catalyst representation and the driver-side replay: integral
    * types map through their Long value, strings through UTF-8.
    */
  def canonicalBytes(v: Any): Array[Byte] = v match {
    case l: Long => longBytes(l)
    case i: Int => longBytes(i.toLong)
    case s: Short => longBytes(s.toLong)
    case b: Byte => longBytes(b.toLong)
    case s: org.apache.spark.unsafe.types.UTF8String => s.getBytes
    case s: String => s.getBytes("UTF-8")
    case other =>
      throw new IllegalArgumentException(
        s"bloom supports integral and string values, got: ${other.getClass}")
  }

  private def longBytes(l: Long): Array[Byte] = {
    val a = new Array[Byte](8)
    var i = 0
    while (i < 8) { a(i) = (l >>> (56 - 8 * i)).toByte; i += 1 }
    a
  }

  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def positions(bits: Int, hashes: Int, bytes: Array[Byte]): Iterator[Int] = {
    val base = fnv64(bytes)
    val h1 = mix64(base ^ 0x243F6A8885A308D3L)
    val h2 = mix64(base ^ 0x13198A2E03707344L) | 1L
    (0 until hashes).iterator.map { i =>
      java.lang.Math.floorMod(h1 + i * h2, bits.toLong).toInt
    }
  }

  def add(words: Array[Long], bits: Int, hashes: Int, bytes: Array[Byte]): Unit =
    positions(bits, hashes, bytes).foreach { p =>
      words(p >>> 6) |= 1L << (p & 63)
    }

  /** Driver-side membership replay over the persisted filter bytes.
    * False positives possible (keep the file), false negatives not —
    * the property the prune's never-lose-rows contract rides on.
    */
  def mightContain(filterBytes: Array[Byte], hashes: Int, value: Any): Boolean = {
    val words = fromBytes(filterBytes)
    val bits = words.length * 64
    positions(bits, hashes, canonicalBytes(value)).forall { p =>
      (words(p >>> 6) & (1L << (p & 63))) != 0L
    }
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](words.length * 8)
    var i = 0
    while (i < words.length) {
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = (words(i) >>> (56 - 8 * j)).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0, "corrupt bloom bytes")
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) {
      var w = 0L
      var j = 0
      while (j < 8) { w = (w << 8) | (bytes(i * 8 + j) & 0xffL); j += 1 }
      words(i) = w
      i += 1
    }
    words
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The batched mapPartitions decode path must agree with the
  * column-only mirror used by the oracle-gated query (same stub
  * arithmetic over the same bytes).
  */
class MultimodalSpec extends SparkSpec {

  test("mapPartitions decode plumbing matches column mirror") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
    val asBinary = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    val viaPartitions = Multimodal.extractMeta(spark, asBinary).toDF()
      .withColumnRenamed("id", "doc_id")
    val viaColumns = Multimodal.metaColumns(docs, "doc_id", "text")
    assert(viaPartitions.except(viaColumns).count() == 0)
    assert(viaColumns.except(viaPartitions).count() == 0)
    assert(viaColumns.count() == docs.count())
  }

  test("resize bounds payloads and recomputes dimensions") {
    import spark.implicits._
    val media = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    val resized = Multimodal.resize(spark, media, maxBytes = 64)
    val rows = resized.collect()
    assert(rows.nonEmpty && rows.forall(_.payload.length <= 64))
    assert(rows.forall(r => r.width >= 16 && r.height >= 16))
  }

  test("frame sampling fans one payload into strided frame records") {
    import spark.implicits._
    val oneVideo = Seq((1L, Array.fill[Byte](1000)(7))).toDS()
    val frames = Multimodal.sampleFrames(spark, oneVideo,
      frameBytes = 100, stride = 2).collect()
    assert(frames.length == 5) // offsets 0,200,...,800
    assert(frames.map(_.frame_idx).toSeq == (0L until 5L))
    assert(frames.forall(_.n_bytes == 100))
  }

  test("decode stub is deterministic per content") {
    val (w1, h1, c1) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val (w2, h2, c2) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert((w1, h1, c1) == (w2, h2, c2))
    assert(w1 >= 16 && w1 < 256 && h1 >= 16 && h1 < 256 && c1 == 3)
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Ivf
import graft.streaming.IvfIngest

/** Streaming IVF index maintenance: after any number of micro-batches,
  * serving from the streamed assignment must equal Ivf.search over the
  * full corpus with the same frozen model BIT FOR BIT — assignment is
  * a row-local map (union of assignments == assignment of union) and
  * doubles round-trip parquet exactly, so the two paths are identical,
  * not approximately so.
  */
class IvfIngestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def topk(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sorted

  test("stream-built IVF index serves bit-identical to the batch search") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val emb = Tables(spark, sf, "embeddings")
    val model = Ivf.train(spark, emb, "vec_id", "embedding", k = 8)
    val rows = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()

    val mem = MemoryStream[(Long, Seq[Double])]
    val q = IvfIngest.start(mem.toDF().toDF("vec_id", "embedding"),
      model, "vec_id", "embedding", dir, s"$dir/__ckpt")
    try {
      Seq(rows.take(13), rows.slice(13, 50), rows.drop(50)).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()

    val queries = emb.filter(col("vec_id") % 100 === 0)
    val direct = Ivf.search(emb, queries, model, "vec_id", "embedding",
      k = 10, nprobe = 4)
    val served = IvfIngest.search(spark, dir, queries, model,
      "vec_id", "embedding", k = 10, nprobe = 4)
    assert(topk(served) == topk(direct),
      "streamed and batch IVF search must be bit-identical")
  }

  test("replay no-ops; compact relocates without changing the serve; the " +
      "marker crash window is safe") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf2").toString
    val emb = Tables(spark, sf, "embeddings")
    val model = Ivf.train(spark, emb, "vec_id", "embedding", k = 8)
    val b0 = emb.filter(col("vec_id") % 2 === 0)
    val b1 = emb.filter(col("vec_id") % 2 === 1)
    IvfIngest.applyBatch(b0, model, "vec_id", "embedding", dir, 0L)
    IvfIngest.applyBatch(b1, model, "vec_id", "embedding", dir, 1L)
    assert(IvfIngest.hasBatch(spark, dir, 0L) &&
      IvfIngest.hasBatch(spark, dir, 1L))

    val queries = emb.filter(col("vec_id") % 100 === 0)
    def serve() = topk(IvfIngest.search(spark, dir, queries, model,
      "vec_id", "embedding", k = 10, nprobe = 4))
    val before = serve()

    // replay is a no-op
    IvfIngest.applyBatch(b1, model, "vec_id", "embedding", dir, 1L)
    assert(serve() == before)

    // crash window: marker write never happened for batch 1 — compact
    // reconstructs it from the committed directory, then the replay
    // after compaction still no-ops
    assert(new java.io.File(s"$dir/_absorbed/batch-1").delete())
    IvfIngest.compact(spark, dir)
    assert(IvfIngest.hasBatch(spark, dir, 1L),
      "compact must reconstruct the marker from the committed directory")
    val dirs = new java.io.File(s"$dir/assign").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("batch=0"), s"expected one compacted dir: $dirs")
    IvfIngest.applyBatch(b1, model, "vec_id", "embedding", dir, 1L)
    assert(serve() == before,
      "replay after compaction must not duplicate assignments")
  }

  test("tombstones: deleted ids vanish from serve, compact applies them " +
      "physically, and re-adds stay suppressed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf3").toString
    val emb = Tables(spark, sf, "embeddings")
    val model = Ivf.train(spark, emb, "vec_id", "embedding", k = 8)
    IvfIngest.applyBatch(emb.filter(col("vec_id") % 2 === 0),
      model, "vec_id", "embedding", dir, 0L)
    IvfIngest.applyBatch(emb.filter(col("vec_id") % 2 === 1),
      model, "vec_id", "embedding", dir, 1L)
    val doomed = emb.filter(col("vec_id") % 7 === 3).select("vec_id")
    IvfIngest.applyDeletes(doomed, "vec_id", dir, 0L)

    val queries = emb.filter(col("vec_id") % 100 === 0)
    val survivors = emb.filter(col("vec_id") % 7 =!= 3)
    def serve() = topk(IvfIngest.search(spark, dir, queries, model,
      "vec_id", "embedding", k = 10, nprobe = 4))
    val batch = topk(Ivf.search(survivors, queries, model,
      "vec_id", "embedding", k = 10, nprobe = 4))
    assert(serve() == batch,
      "post-delete serve must be bit-identical to the batch search " +
        "over the surviving corpus")

    // delete replay is a no-op
    IvfIngest.applyDeletes(doomed, "vec_id", dir, 0L)
    assert(serve() == batch)

    // compact applies committed tombstones physically — the rows leave
    // the assignment state, and the serve is unchanged
    IvfIngest.compact(spark, dir)
    assert(serve() == batch, "compaction must not change the serve")
    assert(spark.read.parquet(s"$dir/assign")
      .filter(col("vid") % 7 === 3).count() == 0,
      "compact must drop tombstoned rows from the assignment state")

    // deletes are terminal: a LATER ingest batch that re-adds a
    // tombstoned vector stays suppressed at serve
    IvfIngest.applyBatch(emb.filter(col("vec_id") % 7 === 3),
      model, "vec_id", "embedding", dir, 5L)
    assert(serve() == batch,
      "re-added tombstoned ids must stay suppressed at serve")
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{IvfPq, Similarity}

/** Scratch tuner (not part of the gate): prints IVF-PQ raw min/avg
  * hits@10 for (nprobe, shortlist) so the qs10 floor can be measured.
  * `sbt "runMain graft.tools.IvfPqTune <nprobe> <shortlist> [sfDir...]"`
  */
object IvfPqTune {
  def main(args: Array[String]): Unit = {
    val nprobe = args.headOption.map(_.toInt).getOrElse(4)
    val iters = sys.env.getOrElse("IVFPQ_ITERS", "2").toInt
    val shortlist = args.drop(1).headOption.map(_.toInt).getOrElse(128)
    val dirs = if (args.length > 2) args.drop(2).toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val emb = Tables(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 100 === 0)
      val t0 = System.nanoTime()
      val model = IvfPq.train(spark, emb, "vec_id", "embedding",
        cells = 8, m = 16, k = 16, iters = iters)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 10)
      val ann = IvfPq.search(spark, emb, q, model, "vec_id", "embedding",
        k = 10, nprobe = nprobe, shortlist = shortlist)
      val hits = Similarity.recallHits(exact, ann)
        .agg(min(col("hits")), avg(col("hits"))).head()
      println(f"[ivfpqtune] $dir nprobe=$nprobe shortlist=$shortlist iters=$iters " +
        f"train=$tTrain%.2fs minHits=${hits.getLong(0)} avgHits=${hits.getDouble(1)}%.2f")
    }
    spark.stop()
  }
}

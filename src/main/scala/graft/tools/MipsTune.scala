package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Scratch tuner (not part of the gate): prints qs13's raw min/avg
  * hits@10 for the norm-augmented MIPS LSH so the recall floor is a
  * measured number. `sbt "runMain graft.tools.MipsTune [sfDir...]"`
  */
object MipsTune {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
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
      val exact = Similarity.mipsTopK(emb, q, "vec_id", "embedding", 10)
      val ann = Similarity.mipsLshTopK(emb, q, "vec_id", "embedding", 10,
        planesPerTable = 3, tables = 24)
      val hits = Similarity.recallHits(exact, ann)
        .agg(min(col("hits")), avg(col("hits"))).head()
      println(f"[mipstune] $dir minHits=${hits.getLong(0)} " +
        f"avgHits=${hits.getDouble(1)}%.2f")
    }
    spark.stop()
  }
}

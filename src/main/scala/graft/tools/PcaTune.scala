package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Pca, Similarity}

/** Scratch tuner (not part of the gate): per-query hits@10 of cosine
  * top-k in the PCA-projected space vs the exact space, across scale
  * factors — sets the qs25 recall floor, and the JL comparison row
  * (same target dims) for BASELINE.md.
  * `sbt "runMain graft.tools.PcaTune [outDims [sfDir...]]"`
  */
object PcaTune {
  def main(args: Array[String]): Unit = {
    val outDims = args.headOption.map(_.toInt).getOrElse(8)
    val dirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val emb = Tables(spark, dir, "embeddings")
      val v = col("embedding").cast("array<double>")
      val nrm = sqrt(aggregate(transform(v, x => x * x),
        lit(0.0), (a, x) => a + x))
      val normed = emb.select(col("vec_id"),
        transform(v, x => x / nrm).as("nv")).localCheckpoint()
      val queries = normed.filter(col("vec_id") % 100 === 0)

      val exact = Similarity.cosineTopK(
        emb, emb.filter(col("vec_id") % 100 === 0),
        "vec_id", "embedding", k = 10)

      def recallOf(proj: org.apache.spark.sql.DataFrame,
                   projQ: org.apache.spark.sql.DataFrame): Seq[Long] = {
        val ann = Similarity.cosineTopK(proj, projQ, "vec_id", "proj", k = 10)
        Similarity.recallHits(exact, ann)
          .select("hits").collect().map(_.getLong(0)).toSeq.sorted
      }

      val t0 = System.nanoTime()
      val model = Pca.train(spark, normed, "vec_id", "nv", outDims)
      val trainS = (System.nanoTime() - t0) / 1e9
      val pcaHits = recallOf(
        Pca.project(normed, model, "vec_id", "nv"),
        Pca.project(queries, model, "vec_id", "nv"))

      val jl = Similarity.jlProject(emb, "vec_id", "embedding")
      val jlArr = jl.select(col("vec_id"),
        array(jl.columns.filter(_.startsWith("y")).map(col).toIndexedSeq: _*)
          .as("proj"))
      val jlHits = recallOf(jlArr, jlArr.filter(col("vec_id") % 100 === 0))

      val rerank = Pca.searchRerank(emb,
        emb.filter(col("vec_id") % 100 === 0), model,
        "vec_id", "embedding", k = 10,
        shortlist = sys.env.getOrElse("PCA_SHORTLIST", "128").toInt)
      val rerankHits = Similarity.recallHits(exact, rerank)
        .select("hits").collect().map(_.getLong(0)).toSeq.sorted

      val ivfModel = graft.operators.Ivf.train(spark,
        Pca.project(normed, model, "vec_id", "nv"), "vec_id", "proj", k = 8)
      val ivfRerank = Pca.searchIvfRerank(spark, emb,
        emb.filter(col("vec_id") % 100 === 0), model, ivfModel,
        "vec_id", "embedding", k = 10,
        shortlist = sys.env.getOrElse("PCA_SHORTLIST", "128").toInt,
        nprobe = sys.env.getOrElse("PCA_NPROBE", "4").toInt)
      val ivfHits = Similarity.recallHits(exact, ivfRerank)
        .select("hits").collect().map(_.getLong(0)).toSeq.sorted

      def stats(h: Seq[Long]) =
        f"min=${h.head} p10=${h(h.size / 10)} mean=${h.sum * 1.0 / h.size}%.2f"
      println(s"$dir outDims=$outDims train=${f"$trainS%.1f"}s " +
        s"n=${pcaHits.size}")
      println(s"  pca ${stats(pcaHits)}")
      println(s"  jl8 ${stats(jlHits)}")
      println(s"  rerank128 ${stats(rerankHits)}")
      println(s"  ivfRerank ${stats(ivfHits)}")
    }
    spark.stop()
  }
}

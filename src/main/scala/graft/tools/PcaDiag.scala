package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Ivf, Pca}

/** Scratch bisect for the qs27 serve cost (not part of any gate). */
object PcaDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") % 100 === 0)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cN = Pca.normalized(emb, "vec_id", "embedding")
    val model = t("pca train")(Pca.train(spark, cN, "vec_id", "nv", 32))
    val pc = Pca.project(cN, model, "vec_id", "nv")
    t("project corpus (noop)")(noop(pc))
    t("project corpus again")(noop(pc))
    val ivf = t("ivf train on proj")(
      Ivf.train(spark, pc, "vec_id", "proj", k = 8))
    val assigned = t("ivf assign (noop)") {
      val a = Ivf.assign(pc, ivf, "vec_id", "proj"); noop(a); a
    }
    val pq2 = Pca.project(Pca.normalized(q, "vec_id", "embedding"),
      model, "vec_id", "nv")
    t("ivf search k=256 (noop)")(
      noop(Ivf.search(pc, pq2, ivf, "vec_id", "proj", k = 256, nprobe = 4)))
    val pcM = t("materialize proj (localCheckpoint)")(pc.localCheckpoint())
    t("ivf search on materialized")(
      noop(Ivf.search(pcM, pq2, ivf, "vec_id", "proj", k = 256, nprobe = 4)))
    t("ivf search k=10")(
      noop(Ivf.search(pc, pq2, ivf, "vec_id", "proj", k = 10, nprobe = 4)))
    t("full searchIvfRerank (noop)")(
      noop(Pca.searchIvfRerank(spark, emb, q, model, ivf,
        "vec_id", "embedding", k = 10, shortlist = 256, nprobe = 4)))
    t("full searchIvfRerank pass2")(
      noop(Pca.searchIvfRerank(spark, emb, q, model, ivf,
        "vec_id", "embedding", k = 10, shortlist = 256, nprobe = 4)))
    spark.stop()
  }
}

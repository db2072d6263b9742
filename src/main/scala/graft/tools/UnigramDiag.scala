package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.UnigramLm

/** Stage-level timing for the unigram tokenizer at a given sf dir. */
object UnigramDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val docs = graft.Tables(spark, dir, "documents")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val wf = t("wordFreqs+ckpt") {
      UnigramLm.wordFreqs(docs, "text").localCheckpoint()
    }
    println(s"[diag] distinct words = ${wf.count()}")
    val seed = t("seedVocab+ckpt") {
      UnigramLm.seedVocab(wf, 6, 1024).localCheckpoint()
    }
    println(s"[diag] seed size = ${seed.count()}")
    val seg1 = t("segment pass (materialize)") {
      UnigramLm.segmentWords(wf, seed, 6).localCheckpoint()
    }
    println(s"[diag] segmented = ${seg1.count()}")
    val vocab = t("full train") { UnigramLm.train(docs, "text") }
    t("encode") {
      UnigramLm.encode(docs, "doc_id", "text", vocab)
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Bpe

/** Step-level timing harness for Bpe.trainIncremental's per-pass plan
  * (diagnosis tool for the round-16 codegen investigation; prints the
  * wall time of each sub-step of the first few passes).
  */
object IncDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val merges = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-inc-diag")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = Tables(spark, sfDir, "documents")
    var vocab = t("init vocab") {
      Bpe.initSymbols(Bpe.wordFreqs(docs, "text"))
        .select("freq", "syms").localCheckpoint()
    }
    var counts = t("init counts")(Bpe.pairCounts(vocab).localCheckpoint())
    for (i <- 1 to merges) {
      println(s"pass $i:")
      val top = t("argmax")(counts.orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect())
      val (a, b) = (top(0).getString(0), top(0).getString(1))
      println(s"  pair = ($a, $b) cnt=${top(0).getLong(2)}")
      val adj = Bpe.hasAdjacency(col("syms"), lit(a), lit(b))
      val affected = t("affected ckpt")(vocab.filter(adj).localCheckpoint())
      println(s"  affected rows = ${affected.count()}")
      val merged = affected.withColumn("syms",
        Bpe.mergeOne(col("syms"), lit(a), lit(b)))
      val delta = Bpe.pairCounts(merged).unionByName(
        Bpe.pairCounts(affected).withColumn("cnt", -col("cnt")))
      val nextCounts = t("counts ckpt") {
        counts.unionByName(delta)
          .groupBy("a", "b").agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") > 0).localCheckpoint()
      }
      val nextVocab = t("vocab ckpt") {
        vocab.filter(!adj).unionByName(merged).localCheckpoint()
      }
      counts.unpersist(); vocab.unpersist(); affected.unpersist()
      counts = nextCounts; vocab = nextVocab
    }
    spark.stop()
  }
}

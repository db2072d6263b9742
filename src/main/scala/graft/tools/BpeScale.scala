package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Bpe

/** Measures the batched-BPE driver-round amortization at scale (the
  * r15 verdict's ask): trains `trainBatched` on a corpus and reports
  * merges learned vs pair-count passes taken — the claim under test is
  * jobs ∝ passes ≪ merges (sequential `train` pays one driver
  * round-trip PER MERGE). Numbers land in BASELINE.md.
  *
  * Usage: runMain graft.tools.BpeScale [sfDir] [numMerges]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bpe-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val merges = Bpe.trainBatched(docs, "text", numMerges = numMerges)
    val sec = (System.nanoTime() - t0) / 1e9
    val passes = Bpe.lastBatchedPasses.get()
    println(f"""{"sf":"$sfDir","merges":${merges.length},"passes":$passes,""" +
      f""""merges_per_pass":${merges.length.toDouble / passes}%.2f,""" +
      f""""train_sec":$sec%.2f}""")
    spark.stop()
  }
}

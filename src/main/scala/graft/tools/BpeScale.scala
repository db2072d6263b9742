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
  * A third arg selects the trainer: `batched` (default) or `inc`
  * ([[Bpe.trainIncremental]] — same merge sequence, pass count =
  * merges, but each pass touches only the affected word subset plus
  * the standing pair table instead of re-aggregating every adjacency).
  *
  * Usage: runMain graft.tools.BpeScale [sfDir] [numMerges] [mode]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(64)
    val mode = args.lift(2).getOrElse("batched")
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
    val merges =
      if (mode == "inc") Bpe.trainIncremental(docs, "text", numMerges)
      else Bpe.trainBatched(docs, "text", numMerges = numMerges)
    val sec = (System.nanoTime() - t0) / 1e9
    val passes =
      if (mode == "inc") merges.length else Bpe.lastBatchedPasses.get()
    println(f"""{"sf":"$sfDir","mode":"$mode","merges":${merges.length},""" +
      f""""passes":$passes,""" +
      f""""merges_per_pass":${merges.length.toDouble / passes}%.2f,""" +
      f""""train_sec":$sec%.2f}""")
    spark.stop()
  }
}

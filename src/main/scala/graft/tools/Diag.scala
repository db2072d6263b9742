package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic runner (not part of the gate): times individual
  * query plans in isolation to chase bench anomalies. Invoke with
  * `sbt "runMain graft.tools.Diag <name> [...]"`.
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-diag")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val byName = graft.SparkEntry.allQueries.map(q => q.name -> q).toMap
    // time build + execute together: several operators materialize
    // eagerly inside build (localCheckpoint, guards), so timing only
    // the final write under-reports them
    def run(q: graft.queries.Q): Double = {
      val t0 = System.nanoTime()
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up
    graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    args.foreach { name =>
      val q = byName(name)
      val times = (1 to 3).map(_ => run(q))
      println(f"[diag] $name%-24s ${times.map(t => f"$t%.3f").mkString(" ")}")
      if (sys.env.contains("SPARK_GRAFT_DIAG_EXPLAIN"))
        q.build(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

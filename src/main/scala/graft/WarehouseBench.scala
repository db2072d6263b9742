package graft

import org.apache.spark.sql.SparkSession

/** Dedicated min-of-N timer for the one-shot star build — the number
  * compared against the reference's 16 s Snowflake dimensional ETL
  * (BASELINE.md). The full Bench measures it single-shot, which two
  * rounds of verdicts flagged as steal-suspect on this host (8.2 s on
  * quiet runs vs 12.2 s under 66-noisy-query steal); this main rebuilds
  * N times back-to-back and prints one JSON line with every pass, so a
  * drift can be adjudicated as noise or regression from the artifact
  * alone. Usage: `sbt "runMain graft.WarehouseBench [passes]"`.
  */
object WarehouseBench {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-warehouse-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm build: JIT/codegen + fixture CSV generation
    graft.refstar.Warehouse.ensure(spark)
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      graft.refstar.Warehouse.rebuild(spark)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"metric":"warehouse_build","value":${times.min}%.3f,""" +
      f""""unit":"sec","passes":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}

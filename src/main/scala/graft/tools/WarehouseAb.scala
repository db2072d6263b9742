package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 warehouse A/B leg (r17 verdict #2, the residual
  * warehouse_build watch): the r17 interleaved A/B read 1.22× at n=2,
  * but each leg's timing sat behind a FULL-SUITE warm pass whose entry
  * count differs across rounds — a confound the verdict called out.
  * This leg isolates the warehouse code itself: fresh JVM, one
  * UNTIMED rebuild (JIT/codegen/first-execution), then N timed
  * rebuilds. Same leg shape on every code snapshot (the only API it
  * touches — `Warehouse.rebuild` — is stable since r15), so
  * alternating legs from two class snapshots answers "did the
  * warehouse code regress?" without the warm-pass confound. Compiled
  * standalone against each snapshot with scalac; driven from one tmux
  * script per the same-host A/B discipline in the verify skill.
  */
object WarehouseAb {
  def main(args: Array[String]): Unit = {
    val passes = sys.env.getOrElse("SPARK_GRAFT_AB_PASSES", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-warehouse-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.refstar.Warehouse.rebuild(spark) // untimed: JIT + first-exec
    val times = (1 to passes).map { p =>
      val t0 = System.nanoTime()
      graft.refstar.Warehouse.rebuild(spark)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[whab] pass$p $dt%.3f s")
      dt
    }
    println(f"[whab] min=${times.min}%.3f s passes=" +
      times.map(t => f"$t%.3f").mkString(","))
    spark.stop()
  }
}

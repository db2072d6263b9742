package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{Blocks, SparkEntry}

/** Round-17 fixed-cost-creep bisect harness (r16 verdict #1).
  *
  * Runs the bench's exact shape — warm pass over the full suite, then
  * the one-shot warehouse build, then ONE timed pass — with the dead
  * localCheckpoint-block sweep toggled by SPARK_GRAFT_SWEEP (0/1).
  * Two back-to-back runs on the same host A/B the sweep: if the
  * creep's cause is pinned dead storage (graft.Blocks scaladoc), the
  * sweep=1 run's warehouse_build and suite total return to the r15
  * levels and the pinned-storage report collapses to ~0.
  */
object CreepDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sweep = sys.env.getOrElse("SPARK_GRAFT_SWEEP", "1") == "1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-creep-diag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def report(tag: String): Unit = {
      val (n, mem, disk) = Blocks.storagePinned(spark)
      println(f"[creep] sweep=$sweep $tag: rdds=$n " +
        f"mem=${mem / 1048576.0}%.1f MiB disk=${disk / 1048576.0}%.1f MiB " +
        f"heapUsed=${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1048576.0}%.0f MiB")
    }

    def runOne(q: graft.queries.Q): Double = {
      val sec =
        try {
          val t0 = System.nanoTime()
          q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[creep] ${q.name} failed: ${e.getMessage}")
            -1.0
        }
      if (sweep) Blocks.sweepLocalCheckpoints(spark)
      sec
    }

    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    var done = 0
    SparkEntry.allQueries.foreach { q =>
      runOne(q); done += 1
      if (done % 70 == 0) report(s"warm after $done")
    }
    report("after warm pass")

    val tWh = System.nanoTime()
    graft.refstar.Warehouse.rebuild(spark)
    println(f"[creep] sweep=$sweep warehouse_build=${(System.nanoTime() - tWh) / 1e9}%.3f s")

    val timed = SparkEntry.allQueries.map(q => q.name -> runOne(q))
    report("after timed pass")
    val ok = timed.filter(_._2 >= 0)
    println(f"[creep] sweep=$sweep timed_total=${ok.map(_._2).sum}%.2f s over ${ok.size} entries")
    // per-entry minima line for offline diffing against bench archives
    val qs = timed.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"creep_sweep":$sweep,"queries":$qs}""")
    spark.stop()
  }
}

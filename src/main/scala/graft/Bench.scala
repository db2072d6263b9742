package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every gated query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query is fully executed
  * through a noop data sink — `.count()` alone would let Catalyst prune
  * the projections and under-report; the noop sink materializes every
  * column of every row without write-side I/O.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one warm-up pass so JIT/codegen/classloading don't dominate query 1
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    // the one-shot star materialization, forced from scratch — this is
    // the number comparable to the reference's end-to-end dimensional
    // ETL (BASELINE.md: 16 s); the qr/qv queries then read the stored
    // tables, exactly like the reference's views query stored tables
    val tWh = System.nanoTime()
    graft.refstar.Warehouse.rebuild(spark)
    val warehouseSec = (System.nanoTime() - tWh) / 1e9

    // three timed passes, keep the per-query minimum: JVM JIT + codegen
    // compilation dominate first-execution times at small scale, this
    // host shows 10-20x transient per-query CPU-steal outliers, and the
    // steady-state minimum is what predicts cluster throughput.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // a failed query reports -1, never its (tiny) time-to-throw: a broken
    // query must not masquerade as a fast one
    def timeOne(q: graft.queries.Q): Double = {
      val t0 = System.nanoTime()
      try {
        q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          -1.0
      }
    }
    // PASS-MAJOR ordering: run the whole suite, then repeat it. Round 8
    // ran each query's passes back-to-back, so a single multi-second
    // CPU-steal episode on this host covered ALL of one query's passes
    // and produced tightly-clustered slow minima that min-of-N cannot
    // reject (qs01 read 13x slow in r8; the same code in full-bench
    // context re-measures at its r7 time). Interleaving separates one
    // query's samples by the whole-suite wall (~60 s), so a steal
    // episode shorter than a pass inflates at most one sample per query.
    val queryList = SparkEntry.allQueries
    val passMatrix: Seq[Seq[Double]] =
      (1 to passes).map(_ => queryList.map(timeOne))
    val results: Seq[(String, Seq[Double])] =
      ("warehouse_build" -> Seq(warehouseSec)) +:
        queryList.zipWithIndex.map { case (q, i) =>
          q.name -> passMatrix.map(_(i))
        }
    val qs = results
      .map { case (k, v) => "\"" + k + f"\":${v.min}%.3f" }
      .mkString("{", ",", "}")
    // per-pass times alongside the minima: this host shows 10-20x
    // transient CPU-steal outliers, and a min with its passes next to it
    // lets a reader machine-detect "one bad pass" vs a real regression
    val pj = results
      .map { case (k, v) => "\"" + k + "\":[" + v.map(x => f"$x%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    // per-query spread (max/min over successful passes): spread > 3x
    // means the samples disagree wildly — steal noise, not signal; the
    // digest's `noisy` counter makes those machine-separable from real
    // regressions without hand-parsing the pass arrays
    def spreadOf(v: Seq[Double]): Double = {
      val ok = v.filter(_ >= 0)
      if (ok.isEmpty || ok.min <= 0) 0.0 else ok.max / ok.min
    }
    val spreads = results.map { case (k, v) => k -> spreadOf(v) }
    val sj = spreads
      .map { case (k, s) => "\"" + k + f"\":$s%.2f" }
      .mkString("{", ",", "}")
    val noisy = spreads.count(_._2 > 3.0)
    val failed = results.filter(_._2.min < 0).map(_._1)
    val total = results.map(_._2.min).filter(_ >= 0).sum
    // stdout gets a DIGEST line (<200 bytes): three rounds of driver
    // artifacts came back `parsed: null` because even the minima-only map
    // for 100+ queries (~3.5 KB) exceeds the ~2 KB stdout tail the driver
    // retains. The per-query minima and per-pass arrays land in the
    // bench_out.json file instead.
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.length},"warehouse_build":$warehouseSec%.3f,"failed":${failed.length},"noisy":$noisy,"sf":"$sfDir"}"""
    println(line)
    val full =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"passes":$pj,"spread":$sj,"failed":${failed.length},"noisy":$noisy,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), full + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out: $e") }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] FAILED queries: ${failed.mkString(", ")}")
      sys.exit(1)
    }
  }
}

package graft
import org.apache.spark.sql.SparkSession
object TimeNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (name <- args.drop(1)) {
      val fn = SparkEntry.queries(name)
      for (p <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).collect().length
        println(f"$name pass$p: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}

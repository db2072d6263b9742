package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Classifier, TextAnalysis}

/** Scratch tuner (not part of the gate): trains the hashed-feature
  * logistic quality classifier against the qt02 teacher rule and
  * prints global + per-(doc_id % 16)-bucket held-out accuracy across
  * scale factors, so the qt27 floor can be set below the measured
  * minimum with a margin.
  * `sbt "runMain graft.tools.ClassifierTune [iters lr [sfDir...]]"`
  */
object ClassifierTune {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(30)
    val lr = args.drop(1).headOption.map(_.toDouble).getOrElse(2.0)
    val dirs = if (args.length > 2) args.drop(2).toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val docs = Tables(spark, dir, "documents")
      val teacher = TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"),
          (col("quality_bucket") === "high").cast("long").as("y"))
      val dims = sys.env.getOrElse("CLS_DIMS", "32").toInt
      val feats = Classifier.featurizeText(docs, "doc_id", "text", dims)
        .join(teacher, "doc_id")
        .localCheckpoint()
      val t0 = System.nanoTime()
      val model =
        if (sys.env.get("CLS_GD").contains("1"))
          Classifier.trainLogistic(
            feats.filter(col("doc_id") % 5 =!= 4), "x", "y", iters, lr)
        else Classifier.trainLogisticNewton(
          feats.filter(col("doc_id") % 5 =!= 4), "x", "y", iters = iters)
      println(f"  train wall=${(System.nanoTime() - t0) / 1e9}%.1fs " +
        "w(0..7)=" + model.weights.take(8).mkString(", "))
      val held = Classifier.predict(
        feats.filter(col("doc_id") % 5 === 4), model, "doc_id",
        passThrough = Seq("y"))
      val acc = held.agg(
        avg((col("pred") === col("y")).cast("double")).as("acc"),
        count(lit(1)).as("n")).head()
      println(f"$dir iters=$iters lr=$lr global acc=${acc.getDouble(0)}%.4f " +
        s"n=${acc.getLong(1)}")
      val byClass = held.groupBy("y")
        .agg(avg((col("pred") === col("y")).cast("double")).as("recall"),
          count(lit(1)).as("n"))
        .orderBy("y").collect()
      println(byClass.map(r =>
        f"  class${r.getLong(0)} recall=${r.getDouble(1)}%.4f n=${r.getLong(2)}")
        .mkString(" "))
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classifier, TextAnalysis}

/** Distributed logistic regression with decimal-exact gradients: the
  * trained-quality-filter surface. The properties that matter are
  * (1) bit-reproducibility across partitionings — the decimal-sum
  * contract the qt27 verdict gate relies on, (2) it actually learns a
  * separable rule, and (3) the featurization layout is the documented
  * one.
  */
class ClassifierSpec extends SparkSpec {

  test("training is bit-identical across partitionings and learns a " +
      "separable rule") {
    import spark.implicits._
    // y = [a + b > 1] with a comfortable margin band — linearly
    // separable in the given features
    val rows = (0 until 400).map { i =>
      val a = (i % 20) / 10.0            // 0.0 .. 1.9
      val b = ((i / 20) % 20) / 10.0     // 0.0 .. 1.9
      val y = if (a + b > 2.2) 1L else if (a + b < 1.8) 0L else -1L
      (i.toLong, Array(1.0, a, b), y)
    }.filter(_._3 >= 0)
    val df = rows.toDF("id", "x", "y")

    val m1 = Classifier.trainLogistic(df.repartition(1), "x", "y",
      iters = 120, lr = 1.0)
    val m7 = Classifier.trainLogistic(df.repartition(7, col("id")), "x", "y",
      iters = 120, lr = 1.0)
    assert(m1.weights.toSeq == m7.weights.toSeq,
      "decimal gradient sums must make training partitioning-independent")

    val acc = Classifier.predict(df, m1, "id", passThrough = Seq("y"))
      .agg(avg((col("pred") === col("y")).cast("double"))).head().getDouble(0)
    assert(acc >= 0.97, s"separable rule must be learned, got $acc")
  }

  test("featurizeText emits the documented layout") {
    import spark.implicits._
    val df = Seq((1L, "the the fast fast fast")).toDF("doc_id", "text")
    val x = Classifier.featurizeText(df, "doc_id", "text", dims = 8)
      .head().getSeq[Double](1)
    assert(x.length == 6 + 8)
    assert(x(0) == 1.0, "intercept feature")
    assert(x(1) == 5 / 40.0, "n_words / 40")
    assert(x(2) == x(1) * x(1), "quadratic length term")
    assert(x(3) == 2.0 / 5.0, "distinct ratio")
    assert(x(4) == x(1) * x(3), "interaction term")
    assert(math.abs(x(5) - 2.0 / 5.0) < 1e-15, "en-stopword ratio ('the')")
    // hashed TF sums to 1 (every word lands in exactly one bucket)
    assert(math.abs(x.drop(6).sum - 1.0) < 1e-12)
    assert(x.drop(6).count(_ > 0) <= 2, "two distinct words, <=2 buckets")
  }

  test("the distilled quality classifier clears the gate floors on the " +
      "documents corpus") {
    val docs = Tables(spark, sfDir, "documents")
    val teacher = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"),
        (col("quality_bucket") === "high").cast("long").as("y"))
    val feats = Classifier.featurizeText(docs, "doc_id", "text", dims = 64)
      .join(teacher, "doc_id").localCheckpoint()
    val model = Classifier.trainLogistic(
      feats.filter(col("doc_id") % 5 =!= 4), "x", "y", iters = 120, lr = 1.0)
    val held = Classifier.predict(
      feats.filter(col("doc_id") % 5 === 4), model, "doc_id",
      passThrough = Seq("y"))
    val global = held
      .agg(avg((col("pred") === col("y")).cast("double"))).head().getDouble(0)
    assert(global >= 0.80, s"held-out accuracy $global below spec floor")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** PolyHash / DotProduct: interpreted vs codegen agreement and
  * reference-implementation equality.
  */
class ExpressionsSpec extends SparkSpec {

  private def refPolyHash(s: String): Long = {
    var h = 7L
    s.codePoints().forEach(cp => h = (h * 31L + cp) % 1000000007L)
    h
  }

  test("polyhash matches reference implementation on sample strings") {
    import spark.implicits._
    val samples = Seq("hello", "a", "the quick brown fox", "x y z", "0123456789")
    val got = samples.toDF("s")
      .select(Text.polyhash(col("s")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == samples.map(refPolyHash))
  }

  test("polyhash is null-safe and codegen/interpreted agree") {
    import spark.implicits._
    val df = Seq(Some("abc"), None, Some("")).toDF("s")
    // codegen path (projection) vs interpreted path (filter eval)
    val viaProject = df.select(Text.polyhash(col("s")).as("h")).collect()
    assert(viaProject.map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq ==
      Seq(refPolyHash("abc"), -1L, 7L))
  }

  test("dot product matches manual computation") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(Text.dot(col("a"), col("b"))).head().getDouble(0)
    assert(got == 32.0)
  }

  test("dot product against testdata embeddings equals HOF fold") {
    val emb = Tables(spark, sfDir, "embeddings")
      .withColumn("v", col("embedding").cast("array<double>"))
      .limit(50)
    val both = emb.select(
      Text.dot(col("v"), col("v")).as("fast"),
      expr("aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, x) -> a + x)")
        .as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
  }
}

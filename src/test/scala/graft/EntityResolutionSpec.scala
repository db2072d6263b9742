package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

class EntityResolutionSpec extends SparkSpec {

  test("deletion-neighborhood pairs equal brute-force levenshtein <= 1") {
    import spark.implicits._
    // covers all three edit kinds plus equality and near-misses:
    // substitution (cat/car), deletion (cart/cat? no — cart/car),
    // insertion (car/cart), exact dup (cat/cat), distance-2 (cat/dog)
    val names = Seq("cat", "car", "cart", "cat", "dog", "dig", "digs",
      "", "a", "ab", "ba", "abc")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    val fastss = EntityResolution.editDistancePairs(df, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .withColumn("d", levenshtein(col("a.name"), col("b.name")).cast("long"))
      .filter(col("d") <= 1)
      .select(col("a.id"), col("b.id"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty && fastss == brute)
  }

  test("pairs feed entity clustering via connected components") {
    import spark.implicits._
    val df = Seq((1L, "acme corp"), (2L, "acme c0rp"), (3L, "acme corps"),
      (4L, "zenith ltd")).toDF("id", "name")
    val pairs = EntityResolution.editDistancePairs(df, "id", "name")
      .select(col("id_a"), col("id_b"))
    val cc = graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
    val labels = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == labels(2L) && labels(2L) == labels(3L))
    assert(!labels.contains(4L) || labels(4L) != labels(1L))
  }

  test("goldenRecord: per-field most-recent-non-null, ties to the record id") {
    import spark.implicits._
    val recs = Seq(
      // entity 1: f1 survives from (r=2,t=3); f2 from the OLDER r=2,t=2
      (1L, 1L, 1L, Option("a"), Option.empty[String]),
      (1L, 2L, 2L, Option.empty[String], Option("x")),
      (1L, 2L, 3L, Option("b"), Option.empty[String]),
      // entity 2: f2 never set - must survive as NULL, not vanish
      (2L, 5L, 4L, Option("z"), Option.empty[String])
    ).toDF("e", "r", "t", "f1", "f2").repartition(3)
    val g = EntityResolution.goldenRecord(recs, "e", "r", "t", Seq("f1", "f2"))
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getString(2), x.getLong(3), x.getLong(4)))).toMap
    assert(g(1L) == (("b", "x", 3L, 2L)), s"got ${g(1L)}")
    assert(g(2L) == (("z", null, 1L, 5L)), s"got ${g(2L)}")
  }
}

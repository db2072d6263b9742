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

  test("blocked jaro-winkler pairs equal brute force within blocks only") {
    import spark.implicits._
    val df = Seq(
      (1L, "jonathan smith", "A"), (2L, "jonathon smith", "A"),
      (3L, "jon smith", "A"), (4L, "maria garcia", "A"),
      // same names in block B — must never pair with block A
      (5L, "jonathan smith", "B"), (6L, "jonathon smyth", "B"),
      (7L, "", "B")
    ).toDF("id", "name", "blk")
    val got = EntityResolution
      .blockedJaroWinklerPairs(df, "id", "name", Seq("blk"), minMicro = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force with the same kernel, block-restricted
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = (for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1
    } yield (a._1, b._1) -> math.floor(
      graft.expressions.JaroWinklerSim.compute(a._2.getBytes("UTF-8"), b._2.getBytes("UTF-8")) * 1000000 + 0.5
    ).toLong).toMap
    assert(got == want)
    assert(got.keys.forall { case (i, j) => (i <= 4) == (j <= 4) },
      "cross-block pair leaked")
    // threshold filter keeps only the near-identical pair
    val strict = EntityResolution
      .blockedJaroWinklerPairs(df, "id", "name", Seq("blk"), minMicro = 950000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 2L)), s"got $strict")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Approximate-sketch operators: error bounds against exact answers
  * (these can't be oracle-gated by exact hash compare, so the bound is
  * the contract).
  */
class SketchesSpec extends SparkSpec {

  test("approx_count_distinct within 3 sigma of its configured rsd") {
    val li = Tables(spark, sfDir, "lineitem")
    // default rsd is 0.05, so individual groups can miss 5%; assert the
    // 3-sigma bound (15%) for the default and 5% for rsd=0.01
    val both = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey")).as("approx_default"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("approx_tight"))
    both.collect().foreach { r =>
      val exact = r.getLong(1)
      assert(math.abs(r.getLong(2) - exact).toDouble / exact < 0.15,
        s"${r.getString(0)}: exact=$exact default=${r.getLong(2)}")
      assert(math.abs(r.getLong(3) - exact).toDouble / exact < 0.05,
        s"${r.getString(0)}: exact=$exact tight=${r.getLong(3)}")
    }
  }

  test("SpaceSaving summary contains every item above the n/m guarantee") {
    import graft.functions.Text
    val words = Tables(spark, sfDir, "documents")
      .select(explode(expr(Text.wordsExpr("text"))).as("w"))
    val n = words.count()
    // the corpus vocabulary is near-uniform (~31 words, max ~n/25), so
    // the capacity must exceed that for the n/m guarantee to select any
    val capacity = 64
    val summary = words
      .agg(graft.functions.Text.spaceSavingTopK(col("w"), capacity, capacity).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.value")).collect().map(_.getString(0)).toSet
    val mustHave = words.groupBy("w").count()
      .filter(col("count") > n / capacity)
      .collect().map(_.getString(0)).toSet
    assert(mustHave.nonEmpty, "test needs at least one heavy hitter")
    assert(mustHave.subsetOf(summary),
      s"missing heavy hitters: ${mustHave diff summary}")
  }

  test("approx median sits between the 40th and 60th exact percentiles") {
    val o = Tables(spark, sfDir, "orders")
    val bounds = o.agg(
      expr("percentile(o_totalprice, 0.4)").as("p40"),
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx"),
      expr("percentile(o_totalprice, 0.6)").as("p60")).head()
    assert(bounds.getDouble(0) <= bounds.getDouble(1) &&
      bounds.getDouble(1) <= bounds.getDouble(2))
  }

  test("Count-Min sketch: partitioning-invariant, never underestimates, " +
    "exact when wide enough") {
    import graft.functions.Text
    import graft.expressions.CountMinAgg
    val words = Tables(spark, sfDir, "documents")
      .select(explode(expr(Text.wordsExpr("text"))).as("w"))
      .select(col("w"), Text.polyhash(col("w")).as("h"))
    def sketchOf(parts: Int): Seq[Long] =
      words.repartition(parts)
        .agg(Text.countMin(col("h"), 512, 4).as("cms"))
        .head().getSeq[Long](0)
    // counter sums commute: any partitioning produces the same sketch
    assert(sketchOf(1) == sketchOf(13))
    // estimates never underestimate, for EVERY distinct word
    val est = CountMinAgg.estimateExpr("cms", "h", 512, 4)
    val audited = words.groupBy("w", "h").agg(count(lit(1)).as("cnt"))
      .crossJoin(words.agg(Text.countMin(col("h"), 512, 4).as("cms")))
      .withColumn("est", expr(est))
    assert(audited.filter(col("est") < col("cnt")).count() == 0)
    // with width >> distinct values the sketch is collision-free: the
    // estimate IS the exact count
    val nDistinct = words.select("w").distinct().count()
    val wide = Integer.highestOneBit(nDistinct.toInt) * 64
    val exactEst = CountMinAgg.estimateExpr("cms", "h", wide, 4)
    val exact = words.groupBy("w", "h").agg(count(lit(1)).as("cnt"))
      .crossJoin(words.agg(Text.countMin(col("h"), wide, 4).as("cms")))
      .withColumn("est", expr(exactEst))
    assert(exact.filter(col("est") =!= col("cnt")).count() == 0,
      s"width $wide should be collision-free for $nDistinct words")
  }

  test("bitmap: exact counts, partitioning-invariant blobs, idempotent " +
    "replay, exact intersection incl. negative keys") {
    import graft.functions.Text
    import graft.expressions.BitmapOps
    val ev = Tables(spark, sfDir, "events")
    // exact: bitmap popcount == COUNT(DISTINCT) for every event_type
    val byType = ev.groupBy("event_type").agg(
      Text.bitmapCount(Text.bitmapAgg(col("user_id"))).as("bm"),
      countDistinct(col("user_id")).as("exact"))
    assert(byType.filter(col("bm") =!= col("exact")).count() == 0)
    // canonical blobs: identical set under ANY partitioning → identical bytes
    def blobOf(parts: Int): Seq[(String, Seq[Byte])] =
      ev.repartition(parts).groupBy("event_type")
        .agg(Text.bitmapAgg(col("user_id")).as("bm"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq)
        .sortBy(_._1).toSeq
    assert(blobOf(1) == blobOf(13))
    // idempotent replay: OR-ing a day's blob into a rollup twice == once
    val daily = ev.select(
      datediff(col("ts").cast("date"), lit("1970-01-01")).as("day"),
      col("user_id"))
      .groupBy("day").agg(Text.bitmapAgg(col("user_id")).as("bm"))
    val once = daily.agg(Text.bitmapCount(Text.bitmapOr(col("bm")))).head.getLong(0)
    val twice = daily.unionByName(daily)
      .agg(Text.bitmapCount(Text.bitmapOr(col("bm")))).head.getLong(0)
    assert(once == twice && once == ev.select("user_id").distinct().count())
    // intersection == exact INTERSECT count, on a pair of segments
    val a = ev.filter(col("event_type") === "view")
    val b = ev.filter(col("event_type") === "click")
    val both = a.agg(Text.bitmapAgg(col("user_id")).as("ba"))
      .crossJoin(b.agg(Text.bitmapAgg(col("user_id")).as("bb")))
      .select(Text.bitmapCount(Text.bitmapAnd(col("ba"), col("bb"))))
      .head.getLong(0)
    val exactBoth = a.select("user_id").intersect(b.select("user_id")).count()
    assert(both == exactBoth)
    // negative keys land in floor-divided words, round-trip exactly
    val m = scala.collection.mutable.LongMap.empty[Long]
    Seq(-1L, -64L, -65L, 0L, 63L, 64L, Long.MinValue, Long.MaxValue)
      .foreach(BitmapOps.set(m, _))
    val blob = BitmapOps.toBytes(m)
    assert(BitmapOps.count(blob) == 8)
    assert(BitmapOps.count(BitmapOps.and(blob, blob)) == 8)
    val n = scala.collection.mutable.LongMap.empty[Long]
    Seq(-1L, 64L, 100L).foreach(BitmapOps.set(n, _))
    assert(BitmapOps.count(BitmapOps.and(blob, BitmapOps.toBytes(n))) == 2)
  }
}

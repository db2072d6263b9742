package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables(spark, sfDir, "lineitem")
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    val salted = SkewJoin.saltedJoin(li, o, Seq("l_orderkey"), salts = 7)
      .select("l_orderkey", "l_linenumber", "o_totalprice")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("salt actually spreads a hot key over partitions") {
    import spark.implicits._
    // one hot key: 10k rows of key 1
    val hot = spark.range(10000).select(lit(1L).as("k"), col("id"))
    val dim = Seq((1L, "x")).toDF("k", "v")
    val salted = SkewJoin.saltedJoin(hot, dim, Seq("k"), salts = 8)
    assert(salted.count() == 10000)
    val saltSpread = hot.withColumn("__salt", (rand(42) * 8).cast("int"))
      .groupBy("__salt").count().count()
    assert(saltSpread == 8, "expected the hot key spread across 8 salts")
  }
}

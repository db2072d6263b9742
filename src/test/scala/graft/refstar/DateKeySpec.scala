package graft.refstar

import org.apache.spark.sql.functions._

/** RefStar.dateKey must accept BOTH source date styles observed in the
  * reference logs (SURVEY §1.2): `M/d/yy` sales dates and
  * `yyyy-MM-dd HH:mm:ss` audit-style timestamps. The oracle
  * (RefStarSql.dateKey) mirrors the same branch arithmetic.
  */
class DateKeySpec extends graft.SparkSpec {

  test("dateKey handles M/d/yy and yyyy-MM-dd[ HH:mm:ss]") {
    import spark.implicits._
    val in = Seq(
      "1/2/13" -> 20130102L,
      "12/31/14" -> 20141231L,
      "2013-01-01 21:20:22" -> 20130101L,
      "2014-06-05" -> 20140605L)
    val got = in.map(_._1).toDF("d")
      .select(col("d"), RefStar.dateKey(col("d")).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    in.foreach { case (s, want) => assert(got(s) == want, s) }
  }
}

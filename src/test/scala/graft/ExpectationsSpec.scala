package graft

import org.apache.spark.sql.functions._

import graft.etl.Expectations
import graft.etl.Expectations.{Rule, fkExists, inRange, inSet, notNull}

/** Expectations: clean/quarantine is an exact partition of the input,
  * violation reasons are complete and canonical, FK rules broadcast,
  * and the audit counts agree with the split.
  */
class ExpectationsSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), Some("a")),  // clean
      (2L, Some(99.0), Some("a")),  // range violation
      (3L, None, Some("b")),        // null (range rule fails on null too)
      (4L, Some(20.0), Some("zz")), // set violation
      (5L, Some(-1.0), None)        // range + set + null violations
    ).toDF("id", "v", "cat")
  }

  private val rules = Seq(
    inRange("v", 0, 50),
    inSet("cat", Seq("a", "b")),
    notNull("cat"))

  test("clean + quarantine partition the input exactly") {
    val df = fixture
    val (clean, quarantine) = Expectations.validate(df, rules)
    assert(clean.columns.toSeq == df.columns.toSeq)
    val cleanIds = clean.select("id").collect().map(_.getLong(0)).toSet
    val qIds = quarantine.select("id").collect().map(_.getLong(0)).toSet
    assert(cleanIds == Set(1L))
    assert(qIds == Set(2L, 3L, 4L, 5L))
    assert((cleanIds & qIds).isEmpty)
  }

  test("violation reasons are complete and sorted") {
    val (_, quarantine) = Expectations.validate(fixture, rules)
    val byId = quarantine.select(col("id"), col("violations"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(2L) == Seq("v_range"))
    assert(byId(3L) == Seq("v_range"))
    assert(byId(4L) == Seq("cat_in_set"))
    assert(byId(5L) == Seq("cat_in_set", "cat_not_null", "v_range"))
  }

  test("FK rule quarantines dangling keys via a broadcast join") {
    import spark.implicits._
    val fact = Seq((1L, 100L), (2L, 200L), (3L, 999L)).toDF("id", "fk")
    val dim = Seq((100L, "x"), (200L, "y")).toDF("k", "name")
    val (clean, quarantine) =
      Expectations.validate(fact, Nil, Seq(fkExists("fk", dim, "k")))
    assert(clean.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val q = quarantine.collect()
    assert(q.map(_.getLong(0)).toSet == Set(3L))
    assert(q.head.getSeq[String](q.head.fieldIndex("violations")) == Seq("fk_fk"))
    val plan = clean.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("audit counts agree with the quarantine split, including the zero row") {
    val df = fixture
    val audit = Expectations.audit(df, rules :+ Rule("id_pos", col("id") > 0))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit("v_range") == ((3L, 2L)))
    assert(audit("cat_in_set") == ((2L, 3L)))
    assert(audit("cat_not_null") == ((1L, 4L)))
    assert(audit("id_pos") == ((0L, 5L))) // declared rule with zero violations
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** The injected optimizer rule must (a) remove the
  * BroadcastNestedLoopJoin from a naive null-wildcard theta join and
  * (b) leave the results identical.
  */
class OrNullJoinRewriteSpec extends SparkSpec {

  private def withExtendedSession[T](f: SparkSession => T): T = {
    // a second SparkSession on the same SparkContext, with extensions
    val prev = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(GraftExtensions.apply)
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  private def thetaJoin(s: SparkSession) = {
    val nation = Tables(s, sfDir, "nation")
    val targets = Tables(s, sfDir, "supplier").select(
      col("s_suppkey").as("t_id"),
      when(col("s_suppkey") % 3 === 0, lit(null).cast("int"))
        .otherwise(col("s_nationkey")).as("t_nationkey"),
      col("s_acctbal").as("t_target"))
    nation.join(targets,
      targets("t_nationkey") === nation("n_nationkey") ||
        targets("t_nationkey").isNull)
      .select("n_nationkey", "n_name", "t_id", "t_target")
  }

  test("rule removes the BNLJ and preserves results") {
    val naive = thetaJoin(spark)
    naive.collect()
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      "without the rule this should be a BNLJ: " + naivePlan.take(800))
    val naiveRows = naive.collect().map(_.toSeq).toSeq.sortBy(_.toString)

    withExtendedSession { s =>
      val rewritten = thetaJoin(s)
      rewritten.collect()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        "rule should have rewritten the join: " + plan.take(800))
      val rows = rewritten.collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(rows == naiveRows)
    }
  }

  test("custom expressions are callable from pure SQL via the extensions") {
    withExtendedSession { s =>
      // graft_polyhash: same value the Column API produces
      val sqlHash = s.sql("SELECT graft_polyhash('table hash part')").head().getLong(0)
      import org.apache.spark.sql.functions.lit
      val colHash = s.range(1)
        .select(graft.functions.Text.polyhash(lit("table hash part")))
        .head().getLong(0)
      assert(sqlHash == colHash)
      // graft_dot over array literals, fused-loop kernel
      val d = s.sql(
        "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
        .head().getDouble(0)
      assert(d == 32.0)
    }
  }
}

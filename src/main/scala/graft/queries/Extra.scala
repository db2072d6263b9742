package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.Exact._

/** Additional relational coverage beyond the reference's own surface:
  * semi/anti joins (EXISTS / NOT EXISTS) and rollup subtotals — part of
  * a complete engine even though the reference never uses them
  * (SURVEY.md §2.3 "No semi/anti", §2.4 "No grouping sets").
  */
object Extra {

  val all: Seq[Q] = Seq(

    // ----- left semi join = EXISTS --------------------------------------
    Q("q33_semi_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "customer")
          .join(
            Tables(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
    },

    // ----- left anti join = NOT EXISTS ----------------------------------
    Q("q34_anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey)""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "customer")
          .join(Tables(s, dir, "orders"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
    },

    // ----- rollup subtotals ----------------------------------------------
    Q("q35_rollup",
      s"""SELECT r_name, n_name, COUNT(*) AS n_suppliers,
         |  ${dsumSql("s_acctbal")} AS total_bal
         |FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)""".stripMargin) { (s, dir) =>
      // via the SQL surface: DataFrame .rollup on a join output trips
      // Spark 4's ambiguous-self-join detector (column lineage tags
      // survive even a fresh select), while the parsed plan is clean
      Seq("supplier", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(
        s"""SELECT r_name, n_name, COUNT(*) AS n_suppliers,
           |  ${dsumSql("s_acctbal")} AS total_bal
           |FROM supplier
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)
    },
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.Text

/** Round-11 session additions: higher-order array-function surface,
  * join/set-op completeness (FULL OUTER, INTERSECT ALL / EXCEPT ALL),
  * and per-domain quality selection for corpus curation.
  *
  * Reference grounding: the reference's transformation views express
  * per-row derived measures and dataset algebra in Snowflake SQL
  * (rahil/create_views.py analytical views; UNION branches in
  * vw_multistore_analysis); Spark's lambda higher-order functions and
  * Dataset set-operators are the Spark-native equivalents, gated here
  * against DuckDB's list lambdas / bag set-ops.
  */
object Round11 {

  private def wCte =
    s"SELECT doc_id, source, ${Text.wordsSql("text")} AS ws FROM documents"

  /** qj15's schema-evolved snapshot table per sfDir (PID-scoped path,
    * self-healing wipe — the qj05 discipline).
    */
  private val evoTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def wipeDir(t: String): Unit = {
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(); ()
    }
    wipe(new java.io.File(t))
  }

  val all: Seq[Q] = Seq(

    // ----- higher-order array functions (codegen'd lambdas) -------------
    // transform / filter / aggregate / zip_with / exists / forall in ONE
    // row-local pass over the tokenized doc. All six are Catalyst
    // HigherOrderFunctions (whole-stage codegen, no UDF); the DuckDB
    // oracle re-expresses each with list lambdas. zip_with carries the
    // position-weighted sum (1-based index times word length) — the
    // Spark side zips against sequence(), the oracle indexes with
    // range(); empty docs are CASE-guarded on both engines because
    // sequence(1,0) descends in Spark and list_sum([]) is NULL in
    // DuckDB.
    Q("qf01_array_hof",
      s"""WITH w AS ($wCte)
         |SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS n_words,
         |  CAST(len(list_filter(ws, w -> length(w) >= 6)) AS BIGINT) AS n_long,
         |  CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT) AS sum_len,
         |  CAST(CASE WHEN len(ws) = 0 THEN 0 ELSE coalesce(list_sum(
         |    list_transform(range(1, len(ws) + 1), i -> length(ws[i]) * i)), 0)
         |  END AS BIGINT) AS pos_weighted_len,
         |  len(list_filter(ws, w -> length(w) >= 8)) > 0 AS has_long_word,
         |  len(list_filter(ws, w -> length(w) > 7)) = 0 AS all_short
         |FROM w""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("ws", expr(Text.wordsExpr("text")))
        .select(
          col("doc_id"),
          size(col("ws")).cast(LongType).as("n_words"),
          size(expr("filter(ws, w -> length(w) >= 6)")).cast(LongType).as("n_long"),
          expr("aggregate(transform(ws, w -> CAST(length(w) AS BIGINT)), CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("sum_len"),
          expr("""CASE WHEN size(ws) = 0 THEN CAST(0 AS BIGINT) ELSE
                 |  aggregate(zip_with(ws, sequence(1, size(ws)),
                 |    (w, i) -> CAST(length(w) AS BIGINT) * i),
                 |    CAST(0 AS BIGINT), (a, x) -> a + x) END""".stripMargin)
            .as("pos_weighted_len"),
          expr("exists(ws, w -> length(w) >= 8)").as("has_long_word"),
          expr("forall(ws, w -> length(w) <= 7)").as("all_short"))
    },

    // ----- FULL OUTER join ----------------------------------------------
    // Both sides are filtered to OVERLAPPING but distinct key subsets so
    // unmatched rows genuinely exist on BOTH sides (customers without
    // order rollups AND order rollups without a surviving customer) —
    // a plain left/right join would hash-pass without exercising the
    // full-outer null-fill. Aggregate-then-join keeps the outer join on
    // pre-shrunk inputs (the scale shape: never outer-join the raw fact).
    Q("q75_full_outer",
      """WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 <> 0),
        |o AS (SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_totalprice) AS max_price
        |      FROM orders WHERE o_custkey % 3 <> 1 GROUP BY o_custkey)
        |SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
        |  c_name, n_orders, max_price
        |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"), col("c_name"))
      val o = Tables(s, dir, "orders")
        .filter(col("o_custkey") % 3 =!= 1)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("max_price"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(coalesce(c("c_custkey"), o("o_custkey")).as("custkey"),
          col("c_name"), col("n_orders"), col("max_price"))
    },

    // ----- bag set-ops: INTERSECT ALL / EXCEPT ALL ----------------------
    // q40/q41 gate the DISTINCT variants; these are the multiset
    // semantics (min-of-multiplicities / multiplicity subtraction) —
    // different operators in both engines, and the duplicate-heavy
    // nationkey columns make the bag/set difference observable.
    Q("q76_intersect_all",
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT ALL
        |SELECT s_nationkey FROM supplier""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersectAll(
          Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
    },
    Q("q77_except_all",
      """SELECT s_nationkey AS nationkey FROM supplier
        |EXCEPT ALL
        |SELECT c_nationkey FROM customer WHERE c_custkey % 50 = 0""".stripMargin) { (s, dir) =>
      Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
        .exceptAll(Tables(s, dir, "customer")
          .filter(col("c_custkey") % 50 === 0)
          .select(col("c_nationkey").as("nationkey")))
    },

    // ----- per-group top-k WITHOUT a window sort ------------------------
    // The ROW_NUMBER-window idiom (the oracle) shuffles every order row
    // to its priority's partition and sorts whole groups; the
    // GroupTopK TypedImperativeAggregate keeps ≤ k pairs per group per
    // partition, so the exchange moves ≤ k·|groups| rows no matter the
    // input size — at 100 TB that's the difference between a full-fact
    // sort and a kilobyte shuffle. Same rows, proven by hashing against
    // the window formulation; partial-agg plan shape CI-locked in
    // PlanChecksSpec, partition invariance in GroupTopKSpec.
    Q("qa09_group_topk",
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |FROM orders)
        |SELECT o_orderpriority, rk, o_orderkey, o_totalprice
        |FROM r WHERE rk <= 5""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(Text.groupTopK(col("o_totalprice"), col("o_orderkey"), 5).as("topk"))
        .select(col("o_orderpriority"), posexplode(col("topk")).as(Seq("pos", "e")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast(LongType).as("rk"),
          col("e.id").as("o_orderkey"),
          col("e.value").as("o_totalprice"))
    },

    // ----- snapshot schema evolution ------------------------------------
    // v0 commits (c_custkey, c_name); v1 APPENDS rows carrying an added
    // c_nationkey column. The manifest's DECLARED schema governs every
    // read (no footer crawl): the latest read null-fills the old files'
    // missing column, and time travel to v0 — asserted in the builder —
    // still returns v0's two-column schema. The oracle reconstructs the
    // same union with an explicit NULL branch.
    Q("qj15_schema_evolution",
      """SELECT c_custkey, c_name, CAST(NULL AS BIGINT) AS c_nationkey
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey
        |FROM customer WHERE c_custkey % 2 = 1""".stripMargin) { (s, dir) =>
      import graft.sources.Snapshots
      val table = evoTables.computeIfAbsent(dir, { d =>
        val t = s"/tmp/graft_evo_${ProcessHandle.current().pid()}_" +
          Integer.toHexString(d.hashCode)
        wipeDir(t)
        val cust = Tables(s, d, "customer")
        Snapshots.commit(s, t,
          cust.filter(col("c_custkey") % 2 === 0).select("c_custkey", "c_name"))
        Snapshots.commit(s, t,
          cust.filter(col("c_custkey") % 2 === 1)
            .select("c_custkey", "c_name", "c_nationkey"),
          mode = "append")
        t
      })
      // time travel reads v0 under v0's schema, not the evolved one
      require(Snapshots.read(s, table, Some(0)).columns.toSeq ==
        Seq("c_custkey", "c_name"),
        "v0 must keep its pre-evolution schema")
      Snapshots.read(s, table)
    },

    // ----- write-time expectations audit --------------------------------
    // Declarative data-quality rules evaluated in one pass with a
    // quarantine split (etl.Expectations — the Delta-expectations
    // shape). The gate audits four rules over lineitem: two range rules
    // with real violations, one that must report ZERO (the empty-path
    // proof), and a referential rule against a deliberately shrunk part
    // dim (simulating late-arriving dim rows) that quarantines ~1/7 of
    // the fact via a broadcast-join flag — the fact never shuffles.
    Q("qq01_expectations_audit",
      """SELECT 'l_discount_range' AS rule,
        |  COUNT(*) FILTER (WHERE NOT coalesce(l_discount IS NOT NULL
        |    AND l_discount >= 0 AND l_discount <= 0.05, FALSE)) AS n_viol,
        |  COUNT(*) - COUNT(*) FILTER (WHERE NOT coalesce(l_discount IS NOT NULL
        |    AND l_discount >= 0 AND l_discount <= 0.05, FALSE)) AS n_pass
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity_range',
        |  COUNT(*) FILTER (WHERE NOT coalesce(l_quantity IS NOT NULL
        |    AND l_quantity >= 1 AND l_quantity <= 45, FALSE)),
        |  COUNT(*) - COUNT(*) FILTER (WHERE NOT coalesce(l_quantity IS NOT NULL
        |    AND l_quantity >= 1 AND l_quantity <= 45, FALSE))
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_tax_nonneg',
        |  COUNT(*) FILTER (WHERE NOT coalesce(l_tax >= 0, FALSE)),
        |  COUNT(*) - COUNT(*) FILTER (WHERE NOT coalesce(l_tax >= 0, FALSE))
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_partkey_fk',
        |  COUNT(*) FILTER (WHERE l_partkey NOT IN
        |    (SELECT p_partkey FROM part WHERE p_partkey % 7 <> 3)),
        |  COUNT(*) - COUNT(*) FILTER (WHERE l_partkey NOT IN
        |    (SELECT p_partkey FROM part WHERE p_partkey % 7 <> 3))
        |FROM lineitem""".stripMargin) { (s, dir) =>
      import graft.etl.Expectations
      val li = Tables(s, dir, "lineitem")
      val shrunkPart = Tables(s, dir, "part").filter(col("p_partkey") % 7 =!= 3)
      Expectations.audit(li,
        Seq(
          Expectations.inRange("l_discount", 0, 0.05),
          Expectations.inRange("l_quantity", 1, 45),
          Expectations.Rule("l_tax_nonneg", col("l_tax") >= 0)),
        Seq(Expectations.fkExists("l_partkey", shrunkPart, "p_partkey")))
    },

    // ----- per-domain quality selection (curation) ----------------------
    // Keep each source's top quarter of documents by vocabulary
    // richness — the "select best-of per domain" curation step that
    // follows scoring (qt02) and precedes mixing (qc06). Exact top-25%
    // via row_number against the partition count with the ceil done as
    // cross-multiplication (rn*4 <= cnt+3), so neither engine divides.
    // Scale: one shuffle on source; within-source ordering is the
    // documented cost — for few huge domains the threshold-first
    // refinement (per-source score quantile, then a filter) avoids the
    // full sort, noted here and benched via the window path.
    Q("qc12_quality_select",
      s"""WITH w AS ($wCte),
         |m AS (SELECT doc_id, source,
         |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words FROM w),
         |r AS (SELECT doc_id, source, n_distinct_words,
         |  ROW_NUMBER() OVER (PARTITION BY source
         |    ORDER BY n_distinct_words DESC, doc_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY source) AS cnt
         |FROM m)
         |SELECT doc_id, source, n_distinct_words, rn
         |FROM r WHERE rn * 4 <= cnt + 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val m = Tables(s, dir, "documents")
        .withColumn("ws", expr(Text.wordsExpr("text")))
        .select(col("doc_id"), col("source"),
          size(array_distinct(col("ws"))).cast(LongType).as("n_distinct_words"))
      val bySource = Window.partitionBy(col("source"))
      val ranked = m
        .withColumn("rn",
          row_number().over(bySource.orderBy(col("n_distinct_words").desc, col("doc_id"))))
        .withColumn("cnt", count(lit(1)).over(bySource))
      ranked.filter(col("rn") * 4 <= col("cnt") + 3)
        .select(col("doc_id"), col("source"), col("n_distinct_words"),
          col("rn").cast(LongType).as("rn"))
    }
  )
}

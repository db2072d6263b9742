package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative write-time data-quality expectations with quarantine —
  * the constraint-enforcement step the reference runs implicitly via
  * Snowflake NOT NULL DDL + FK fallback seeding
  * (rahil/create_tables.py staging DDLs; unknown-member INSERTs in
  * rahil/elt_load.py), generalized to the Delta-expectations shape: a
  * rule set evaluated in ONE pass, violating rows diverted to a
  * quarantine table with per-row reasons instead of failing the load.
  *
  * Scale: every row-local rule compiles to a codegen'd Column predicate
  * (zero shuffles, evaluated inside the scan's WholeStageCodegen);
  * `fkExists` adds one broadcast left join against the dim's distinct
  * keys — never a shuffle of the fact. The split is two filters over
  * the same one-pass-derived violations column, so Spark evaluates the
  * rule set once per consumer and nothing is collected to the driver.
  */
object Expectations {

  /** One named expectation: `passes` is true for conforming rows. */
  final case class Rule(name: String, passes: Column)

  def notNull(c: String): Rule = Rule(s"${c}_not_null", col(c).isNotNull)

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"${c}_range", col(c).isNotNull && col(c) >= lo && col(c) <= hi)

  def inSet(c: String, allowed: Seq[String]): Rule =
    Rule(s"${c}_in_set", col(c).isin(allowed: _*))

  def matches(c: String, regex: String): Rule =
    Rule(s"${c}_format", col(c).rlike(regex))

  /** Referential expectation: `factKey` must exist in `dimKey` of
    * `dim`. Implemented as a broadcast left join on the dim's DISTINCT
    * keys — the fact never shuffles; the flag column is consumed by
    * [[validate]] like any row-local rule.
    */
  final case class FkRule(name: String, factKey: String, dim: DataFrame, dimKey: String)

  def fkExists(factKey: String, dim: DataFrame, dimKey: String): FkRule =
    FkRule(s"${factKey}_fk", factKey, dim, dimKey)

  /** Evaluate all rules in one pass. Returns (clean, quarantine) where
    * quarantine carries a sorted `violations` array<string> of the
    * failed rule names (sorted so downstream grouping is canonical).
    */
  def validate(
      df: DataFrame,
      rules: Seq[Rule],
      fks: Seq[FkRule] = Nil): (DataFrame, DataFrame) = {
    // FK flags first: one broadcast join per FK rule on distinct keys
    val withFk = fks.foldLeft(df) { (acc, fk) =>
      val keys = fk.dim.select(col(fk.dimKey).as(s"__fk_${fk.name}_key")).distinct()
      acc.join(broadcast(keys),
          acc(fk.factKey) === keys(s"__fk_${fk.name}_key"), "left")
        .withColumn(s"__fk_${fk.name}_ok", col(s"__fk_${fk.name}_key").isNotNull)
        .drop(s"__fk_${fk.name}_key")
    }
    val allChecks: Seq[(String, Column)] =
      rules.map(r => r.name -> r.passes) ++
        fks.map(fk => fk.name -> col(s"__fk_${fk.name}_ok"))
    val viol = array_sort(expr_filter(
      array(allChecks.map { case (n, p) =>
        when(!coalesce(p, lit(false)), lit(n))
      }: _*)))
    val flagged = withFk
      .withColumn("violations", viol)
      .drop(fks.map(fk => s"__fk_${fk.name}_ok"): _*)
    val clean = flagged.filter(size(col("violations")) === 0).drop("violations")
    val quarantine = flagged.filter(size(col("violations")) > 0)
    (clean, quarantine)
  }

  /** Per-rule violation/pass counts in one aggregation pass (the audit
    * row the load step logs next to the golden counts).
    */
  def audit(df: DataFrame, rules: Seq[Rule], fks: Seq[FkRule] = Nil): DataFrame = {
    val (_, quarantine) = validate(df, rules, fks)
    val total = df.count()
    val names = rules.map(_.name) ++ fks.map(_.name)
    val perRule = quarantine
      .select(explode(col("violations")).as("rule"))
      .groupBy("rule").agg(count(lit(1)).as("n_viol"))
    // include zero-violation rules: seed from the declared rule list
    import df.sparkSession.implicits._
    names.toDF("rule")
      .join(perRule, Seq("rule"), "left")
      .select(col("rule"),
        coalesce(col("n_viol"), lit(0L)).as("n_viol"),
        (lit(total) - coalesce(col("n_viol"), lit(0L))).as("n_pass"))
  }

  // array_compact-style: drop the nulls the unfired WHENs leave behind
  private def expr_filter(arr: Column): Column =
    filter(arr, x => x.isNotNull)
}

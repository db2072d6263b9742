package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, CreateArray, EqualNullSafe, EqualTo, Explode, Expression, If, IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the reference's null-wildcard join pattern
  * (rahil/create_views.py:253-258): an inner join on
  * `a = b OR b IS NULL` — "a NULL key matches everything". Catalyst can
  * only execute that as a BroadcastNestedLoopJoin (O(n*m) comparisons).
  *
  * Rewrite: explode the non-wildcard side into match keys
  * `a IS NULL ? [null] : [a, null]` and join with null-safe equality
  *
  *   Project(original output,
  *     Join(Generate(explode(keys), left), right, ENS(__wild_key, b)))
  *
  * Each left row matches `b = a` rows via its real key and `b IS NULL`
  * wildcard rows via its null key — exactly once each, preserving the
  * original multiplicity (incl. the a-IS-NULL corner: the original
  * predicate only matches through the wildcard branch, and the rewrite
  * emits only the null key). EqualNullSafe is hash-joinable, so both
  * match classes flow through one shuffled/broadcast hash join at any
  * scale — no nested loop, no subtree duplication.
  *
  * Scope: single-disjunct conditions with the IS NULL column on one
  * side and an equality spanning both. Conjunctions of several
  * OR-IS-NULL clauses (the reference stacks four) stay on the manual
  * union-of-equi rewrite (graft.queries.Relational q16).
  */
object OrNullJoinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(Or(eq @ EqualTo(x, y), IsNull(c: Attribute))), hint)
        if right.outputSet.contains(c) &&
          isSided(eq, left, right) && sideOf(eq, right).semanticEquals(c) =>
      val a = sideOf(eq, left) // probe-side key expression
      val keyType = a.dataType
      val nullKey = Literal.create(null, keyType)
      val keys = If(IsNull(a), CreateArray(Seq(nullKey)), CreateArray(Seq(a, nullKey)))
      val wildKey = AttributeReference("__wild_key", keyType, nullable = true)()
      val gen = Generate(Explode(keys), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(wildKey), child = left)
      val joined = Join(gen, right, Inner, Some(EqualNullSafe(wildKey, c)), hint)
      Project(j.output, joined)
  }

  /** eq has one reference set entirely in `left` and one in `right`. */
  private def isSided(eq: EqualTo, left: LogicalPlan, right: LogicalPlan): Boolean =
    Seq(eq.left, eq.right).forall(e =>
      e.references.subsetOf(left.outputSet) || e.references.subsetOf(right.outputSet)) &&
      eq.references.intersect(left.outputSet).nonEmpty &&
      eq.references.intersect(right.outputSet).nonEmpty

  /** The operand of eq that resolves against `side`. */
  private def sideOf(eq: EqualTo, side: LogicalPlan): Expression =
    if (eq.left.references.subsetOf(side.outputSet)) eq.left else eq.right
}

/** Session extensions entry point: install with
  * `SparkSession.builder().withExtensions(GraftExtensions.apply)`.
  *
  * Injects the optimizer rule AND registers the custom expressions as
  * SQL functions (`graft_polyhash`, `graft_dot`), so the pure-SQL
  * surface — the way the reference's users work — reaches the same
  * codegen'd kernels the DataFrame API uses, with identical semantics
  * to the DuckDB oracle fragments in graft.functions.Text.
  */
object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => OrNullJoinRewrite)
    e.injectOptimizerRule(_ => RangeBinJoinRewrite)
    e.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[graft.expressions.PolyHash].getName,
        "graft_polyhash"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_polyhash(str)")
        graft.expressions.PolyHash(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.expressions.DotProduct].getName,
        "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_dot(array, array)")
        graft.expressions.DotProduct(args(0), args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[graft.expressions.JaroWinklerSim].getName,
        "graft_jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_jaro_winkler(str, str)")
        graft.expressions.JaroWinklerSim(args(0), args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_jaro_winkler_cp"),
      new ExpressionInfo(classOf[graft.expressions.JaroWinklerSimCp].getName,
        "graft_jaro_winkler_cp"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_jaro_winkler_cp(str, str)")
        graft.expressions.JaroWinklerSimCp(args(0), args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_bitmap_count"),
      new ExpressionInfo(classOf[graft.expressions.BitmapCount].getName,
        "graft_bitmap_count"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_bitmap_count(blob)")
        graft.expressions.BitmapCount(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_bitmap_and"),
      new ExpressionInfo(classOf[graft.expressions.BitmapAnd].getName,
        "graft_bitmap_and"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_bitmap_and(blob, blob)")
        graft.expressions.BitmapAnd(args(0), args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[graft.expressions.NfcNormalize].getName,
        "graft_nfc"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_nfc(str)")
        graft.expressions.NfcNormalize(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_bitmap_agg"),
      new ExpressionInfo(classOf[graft.expressions.BitmapAgg].getName,
        "graft_bitmap_agg"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_bitmap_agg(long)")
        graft.expressions.BitmapAgg(args.head).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("graft_group_topk"),
      new ExpressionInfo(classOf[graft.expressions.GroupTopK].getName,
        "graft_group_topk"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "graft_group_topk(value, id, k)")
        val k = args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"k must be an integer literal, got $other")
        }
        graft.expressions.GroupTopK(args(0), args(1), k).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("graft_bitmap_or_agg"),
      new ExpressionInfo(classOf[graft.expressions.BitmapOrAgg].getName,
        "graft_bitmap_or_agg"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_bitmap_or_agg(blob)")
        graft.expressions.BitmapOrAgg(args.head).toAggregateExpression()
      }))
  }
}

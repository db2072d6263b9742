package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, AttributeReference, EqualNullSafe, EqualTo, Explode,
  Expression, GreaterThanOrEqual, If, IntegralDivide, LessThanOrEqual,
  Literal, Pmod, PredicateHelper, Sequence, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule for equi-key-less RANGE joins — `point BETWEEN lo
  * AND hi` with no equality conjunct spanning the sides. Catalyst can
  * only execute that as a nested-loop join (every point row compared
  * against every interval row: O(n·m) at any scale), which is exactly
  * the plan a 100 TB events⋈sessions or fact⋈calendar-band join must
  * never produce.
  *
  * Rewrite (the standard bin-join reduction, the automatic form of
  * what q43 composes by hand): pick a bin width W from
  * `spark.graft.rangeJoin.binWidth`, explode each interval row into
  * the bins [floorDiv(lo,W) .. floorDiv(hi,W)] it overlaps, bin each
  * point row as floorDiv(p,W), and equi-join on the bin with the
  * original range predicate re-applied. Each qualifying (point,
  * interval) pair meets EXACTLY once — in the point's unique bin — so
  * multiplicity is preserved without dedup; NULL points/bounds bin to
  * NULL/empty and match nothing, same as the original predicate; an
  * inverted interval (lo > hi) explodes to zero bins instead of
  * tripping Sequence's direction check. The bin equality is
  * hash-joinable, so the plan becomes a shuffled/broadcast hash or
  * sort-merge join with per-bin work proportional to bin occupancy —
  * the caller tunes W to the interval length scale (W ≈ max interval
  * length makes each interval span ≤ 2 bins).
  *
  * Scope: inner joins, LongType point and bounds (timestamps as epoch
  * micros), rule inert unless the width conf is set positive. floorDiv
  * is built as (a − pmod(a,W)) div W so negative domains bin
  * correctly (IntegralDivide truncates toward zero; pmod is
  * non-negative).
  */
object RangeBinJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthConf = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toLong
    if (width <= 0) return plan
    val w = Literal(width, LongType)

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if findRange(cond, left, right).isDefined &&
            !hasSpanningEquality(cond, left, right) =>
        val (p, lo, hi) = findRange(cond, left, right).get
        val pointOnLeft = p.references.subsetOf(left.outputSet)
        val intervalPlan = if (pointOnLeft) right else left
        val bins = If(LessThanOrEqual(lo, hi),
          Sequence(floorDiv(lo, w), floorDiv(hi, w),
            Some(Literal(1L, LongType)),
            Some(conf.sessionLocalTimeZone)),
          Literal.create(Seq.empty[Long], ArrayType(LongType)))
        val binAttr = AttributeReference("__range_bin", LongType, nullable = false)()
        val gen = Generate(Explode(bins), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(binAttr),
          child = intervalPlan)
        val newCond = And(EqualTo(binAttr, floorDiv(p, w)), cond)
        val joined =
          if (pointOnLeft) Join(left, gen, Inner, Some(newCond), hint)
          else Join(gen, right, Inner, Some(newCond), hint)
        Project(j.output, joined)
    }
  }

  private def floorDiv(a: Expression, w: Literal): Expression =
    IntegralDivide(Subtract(a, Pmod(a, w)), w)

  /** The conjuncts contain `p >= lo` and `p <= hi` (either operand
    * orientation) with p entirely from one side and lo, hi both
    * entirely from the other — returns (p, lo, hi).
    */
  private def findRange(cond: Expression, left: LogicalPlan,
                        right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def sided(e: Expression): Boolean =
      e.dataType == LongType && e.references.nonEmpty &&
        (e.references.subsetOf(left.outputSet) ||
          e.references.subsetOf(right.outputSet))
    def opposite(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))
    // p >= lo candidates as (p, lo)
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p, lo) if sided(p) && sided(lo) && opposite(p, lo) => (p, lo)
      case LessThanOrEqual(lo, p) if sided(p) && sided(lo) && opposite(p, lo) => (p, lo)
    }
    // p <= hi candidates as (p, hi)
    val uppers = conjuncts.collect {
      case LessThanOrEqual(p, hi) if sided(p) && sided(hi) && opposite(p, hi) => (p, hi)
      case GreaterThanOrEqual(hi, p) if sided(p) && sided(hi) && opposite(p, hi) => (p, hi)
    }
    (for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers
      if p1.semanticEquals(p2) &&
        // lo and hi from the SAME side (the interval side)
        (lo.references.subsetOf(left.outputSet) ==
          hi.references.subsetOf(left.outputSet))
    } yield (p1, lo, hi)).headOption
  }

  /** An equality conjunct spanning both sides already makes the join
    * hash-executable — leave those joins to Catalyst.
    */
  private def hasSpanningEquality(cond: Expression, left: LogicalPlan,
                                  right: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case e @ (_: EqualTo | _: EqualNullSafe) =>
        e.references.intersect(left.outputSet).nonEmpty &&
          e.references.intersect(right.outputSet).nonEmpty
      case _ => false
    }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampType}

/** Auto-rewrite of VARIABLE-width interval containment joins.
  *
  * [[BandedRangeJoinRule]] upgrades fixed-width bands (`pt BETWEEN
  * other - 100 AND other` — one attribute pair, literal offsets). The
  * equally common spelling it cannot cover is containment in a
  * variable-width interval — `p.ts BETWEEN iv.lo AND iv.hi` with `lo`
  * and `hi` DIFFERENT columns — which has no equi key and no static
  * width, so Spark nested-loops the cross space and a user had to know
  * to call `Relational.intervalJoin` by hand (round-6 verdict item 5).
  *
  * This rule performs that operator's rewrite automatically, lifting the
  * bucket width from the data itself: a scalar subquery computes
  * `max(hi - lo) + 1` over the (valid-)interval side — one column-pruned
  * aggregate pass, the exact cost of `Relational.maxIntervalWidth` — and
  * the join becomes
  *
  *  - points: bucket ONCE on `floor(pt / width)`;
  *  - intervals: keep `lo <= hi` rows (an inverted interval matches
  *    nothing, and `sequence` would reject a descending range), explode
  *    to `sequence(floor(lo/width), floor(hi/width))` — by construction
  *    every interval length < width, so that is AT MOST TWO buckets;
  *  - equi-join on the bucket with the ORIGINAL predicate as residual.
  *
  * A contained point satisfies bucket(lo) <= bucket(pt) <= bucket(hi)
  * (floor division is monotone), so every matching pair meets in exactly
  * one bucket — the point's — and no dedup step is needed; the residual
  * re-check makes the result identical to the naive plan's
  * (IntervalRuleSpec asserts both). Empty or all-inverted interval
  * sides yield a NULL width, a NULL point bucket and an empty explode —
  * the empty join result the naive plan produces, with no special case.
  *
  * Eligibility is deliberately narrow: INNER join, no equi conjunct, a
  * lower and an upper bound between bare int/long/timestamp attributes
  * (timestamps run as exact `unix_micros` longs, the same domain as
  * their comparison semantics), `pt` alone on one side and `lo`/`hi`
  * together on the other. Like the banded rule it only fires under ANSI
  * mode, where `hi - lo` / bucket arithmetic near the long extremes is a
  * LOUD error instead of a silent wrap.
  *
  * Cost at scale: the width subquery is one tiny aggregate; the rewrite
  * then shuffles points once and intervals at most twice instead of
  * broadcasting one whole side and looping. The width-from-max design
  * inherits `maxIntervalWidth`'s documented skew: one outlier-long
  * interval widens every bucket (correctness unaffected — the residual
  * filters — but bucket population grows). AQE's skew-join split is the
  * runtime backstop; callers with a known length distribution can still
  * pick a tighter width via `Relational.intervalJoin`.
  */
object IntervalOverlapJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** `pt cmp bound` with both sides bare attributes, oriented so `pt` is
    * the (candidate) point.
    */
  private case class IvBound(pt: AttributeReference,
      bound: AttributeReference, isLower: Boolean)

  private def eligible(a: AttributeReference): Boolean =
    a.dataType == LongType || a.dataType == IntegerType ||
      a.dataType == TimestampType || a.dataType == DateType

  /** Micros arithmetic on a timestamp pairs only with a timestamp, days
    * arithmetic on a date only with a date; int/long pair freely (both
    * run in long). A date–timestamp comparison arrives cast-wrapped and
    * safely misses.
    */
  private def domainOf(a: AttributeReference): Int = a.dataType match {
    case TimestampType => 1 // epoch-micros
    case DateType => 2      // epoch-days
    case _ => 0             // integral
  }

  private def sameDomain(a: AttributeReference, b: AttributeReference): Boolean =
    domainOf(a) == domainOf(b)

  /** `attr` in its native long domain (exact epoch-micros for
    * timestamps — a long cast would truncate to seconds; epoch-days for
    * dates).
    */
  private def asLong(a: AttributeReference): Expression = a.dataType match {
    case LongType => a
    case TimestampType => UnixMicros(a)
    case DateType => Cast(UnixDate(a), LongType)
    case _ => Cast(a, LongType)
  }

  /** Both readings of one comparison: `a >= b` bounds a below by b AND
    * bounds b above by a — the pairing step disambiguates which attr is
    * the point.
    */
  private def ivBounds(e: Expression): Seq[IvBound] = {
    def mk(p: Expression, b: Expression): Seq[IvBound] = (p, b) match {
      case (pa: AttributeReference, ba: AttributeReference)
          if eligible(pa) && eligible(ba) && sameDomain(pa, ba) &&
            pa.exprId != ba.exprId =>
        Seq(IvBound(pa, ba, isLower = true), IvBound(ba, pa, isLower = false))
      case _ => Nil
    }
    e match {
      // mk(ge, le) emits ge-is-point-with-lower-bound-le + the flip
      case GreaterThanOrEqual(a, b) => mk(a, b)
      case GreaterThan(a, b) => mk(a, b)
      case LessThanOrEqual(a, b) => mk(b, a)
      case LessThan(a, b) => mk(b, a)
      case _ => Nil
    }
  }

  /** Sign-correct floor division by a positive width expression. */
  private def floorDiv(x: Expression, w: Expression): Expression =
    IntegralDivide(Subtract(x, Pmod(x, w)), w)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.ansiEnabled) plan else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            val (ra, rb) = (a.references, b.references)
            ra.nonEmpty && rb.nonEmpty &&
              ((ra.subsetOf(left.outputSet) && rb.subsetOf(right.outputSet)) ||
                (ra.subsetOf(right.outputSet) && rb.subsetOf(left.outputSet)))
          case _ => false
        }
        if (hasEqui) j
        else {
          val all = conjuncts.flatMap(ivBounds)
          // pt on one side; lo/hi two DIFFERENT attrs together on the other
          val found = all.collectFirst(Function.unlift { (lb: IvBound) =>
            if (!lb.isLower) None
            else all.collectFirst {
              case ub if !ub.isLower && ub.pt.exprId == lb.pt.exprId &&
                ub.bound.exprId != lb.bound.exprId &&
                sameSide(left, right, lb.bound, ub.bound) &&
                crossSide(left, right, lb.pt, lb.bound) => (lb.pt, lb.bound, ub.bound)
            }
          })
          found match {
            case Some((pt, lo, hi)) =>
              val (ptSide, ivSide, ptIsLeft) =
                if (left.outputSet.contains(pt)) (left, right, true)
                else (right, left, false)
              // one aggregate over the VALID intervals only — an
              // all-inverted side must yield NULL width (empty result),
              // not a nonpositive divisor
              def widthSq(): Expression = ScalarSubquery(
                Aggregate(Nil,
                  Seq(Alias(Add(
                    Max(Subtract(asLong(hi), asLong(lo))).toAggregateExpression(),
                    Literal(1L, LongType)), "__graft_iv_w")()),
                  Project(Seq(lo, hi),
                    Filter(LessThanOrEqual(asLong(lo), asLong(hi)), ivSide))))
              val pB = Alias(floorDiv(asLong(pt), widthSq()), "__graft_iv_pb")()
              val newPt = Project(ptSide.output :+ pB, ptSide)
              val ivW = widthSq()
              val loB = Alias(floorDiv(asLong(lo), ivW), "__graft_iv_lb")()
              val hiB = Alias(floorDiv(asLong(hi), ivW), "__graft_iv_hb")()
              val pruned = Project(ivSide.output ++ Seq(loB, hiB),
                Filter(LessThanOrEqual(asLong(lo), asLong(hi)), ivSide))
              val ivOut = AttributeReference(
                "__graft_iv_b", LongType, nullable = true)()
              val gen = Generate(
                // Sequence is TimeZoneAwareExpression: a defined zone is
                // required for RESOLUTION even though long sequences
                // never consult it
                Explode(Sequence(loB.toAttribute, hiB.toAttribute,
                  Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(ivOut), child = pruned)
              val newCond = And(EqualTo(pB.toAttribute, ivOut), cond)
              val newJoin =
                if (ptIsLeft) Join(newPt, gen, Inner, Some(newCond), hint)
                else Join(gen, newPt, Inner, Some(newCond), hint)
              Project(j.output, newJoin)
            case None => j
          }
        }
    }

  private def crossSide(l: LogicalPlan, r: LogicalPlan,
      a: AttributeReference, b: AttributeReference): Boolean =
    (l.outputSet.contains(a) && r.outputSet.contains(b)) ||
      (l.outputSet.contains(b) && r.outputSet.contains(a))

  private def sameSide(l: LogicalPlan, r: LogicalPlan,
      a: AttributeReference, b: AttributeReference): Boolean =
    (l.outputSet.contains(a) && l.outputSet.contains(b)) ||
      (r.outputSet.contains(a) && r.outputSet.contains(b))
}

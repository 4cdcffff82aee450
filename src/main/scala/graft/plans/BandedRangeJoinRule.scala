package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, DayTimeIntervalType, IntegerType, LongType, TimestampType}

/** Auto-rewrite of bare range-predicate joins into banded equi-joins.
  *
  * A join whose only cross-side predicates are a range band —
  * `l BETWEEN r + lo AND r + hi` in any conjunct order/orientation, on
  * long columns (event-time micros, sequence numbers) — has no equi key,
  * so Spark plans BroadcastNestedLoopJoin: every left row against every
  * right row, the plan that dies first at scale. But a fixed-width band
  * admits the classic distributed rewrite (the same one
  * `Relational.purchaseClickContext` hand-writes): bucket the bounded
  * side by the band width, explode the probe side to its two covering
  * buckets, equi-join on the bucket, and keep the original predicate as
  * a residual filter. This rule applies that rewrite automatically to
  * any eligible logical Join, so a SQL user writing the naive range join
  * gets the scalable plan — SURVEY.md §2.10 ladder rung (c): a
  * `Rule[LogicalPlan]` where no built-in operator or expression can fix
  * the plan shape.
  *
  * Eligibility (deliberately narrow — miss, never mis-rewrite):
  *  - Inner join with a conjunctive condition, NO cross-side equality
  *    conjunct (an equi key means hash/merge join already works — and the
  *    rewritten join's own bucket equality makes the rule a no-op on its
  *    output, which is also the termination proof);
  *  - among the conjuncts, a lower and an upper bound on the SAME pair of
  *    int/long/timestamp/date `AttributeReference`s from opposite sides, each
  *    of the form `attr cmp attr' + literal` (Add/Subtract/bare for the
  *    integral types; `TimestampAddInterval` with a day-time-interval
  *    literal for timestamps — the optimizer rewrites
  *    `t - INTERVAL '1' HOUR` to `t + INTERVAL '-1' HOUR` before this
  *    batch, so one shape covers both spellings), any orientation (a
  *    mixed-type pair arrives cast-wrapped and safely misses; both attrs
  *    must share a domain — integral with integral, timestamp with
  *    timestamp — so the offset arithmetic is meaningful);
  *  - band width = hi − lo > 0 (width 0 is an equality in disguise).
  *
  * Timestamps are micros-typed longs underneath: a day-time-interval
  * literal IS a micros count, `unix_micros` exposes the attr's exact
  * micros (never the truncating seconds cast), and the bucket arithmetic
  * is the identical long math. This covers the reference's own event-time
  * domain (srapk_structure_streaming.py:148-153) written as
  * `ts BETWEEN t - INTERVAL x AND t`, which previously fell through to
  * the nested-loop plan this rule exists to kill. Year-month intervals
  * (variable length) and TIMESTAMP_NTZ safely miss. DateType bands
  * (`order_date BETWEEN d - 30 AND d`) run the same way in the
  * epoch-DAYS domain: DateAdd/DateSub offsets are day counts and
  * `unix_date` exposes the attr's exact days — dates pair only with
  * dates (a date–timestamp comparison arrives cast-wrapped and misses).
  *
  * The rule only fires under ANSI mode (the Spark 4 default): with ANSI
  * off, long overflow in the bucket arithmetic near Long.MinValue/
  * MaxValue would silently wrap and misbucket instead of erroring — a
  * config-dependent divergence from the naive plan. Non-ANSI sessions
  * keep the naive nested-loop semantics.
  *
  * Correctness: buckets partition ℤ into width-B cells via sign-correct
  * floor division, and an interval of length ≤ B intersects at most two
  * consecutive cells — the two the probe side explodes to. The original
  * condition is re-checked on every bucket-colocated candidate, so the
  * rewrite can only ever equal the naive join's result (BandedJoinSpec
  * asserts equality against the nested-loop plan, and that the rewritten
  * plan contains no BroadcastNestedLoopJoin).
  *
  * Nulls: a null band attr fails both the original range predicate (null
  * ⇒ filtered by the inner join) and the bucket equality, so rewritten
  * and naive plans drop exactly the same rows.
  *
  * Numeric edge: the bucket arithmetic (`x − pmod(x, w)`, `probe + lo`)
  * can overflow for values within a band width of Long.MinValue/MaxValue.
  * Under ANSI mode (the Spark 4 default) that is a LOUD runtime error,
  * never a silently misbucketed pair — the same contract as the naive
  * plan's own `attr + literal` arithmetic at those extremes. Timestamps
  * and sequence numbers never approach the edge.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** `attr cmp other + offset`, oriented so `attr` is on the left. */
  private case class Bound(attr: AttributeReference,
      other: AttributeReference, offset: Long, isLower: Boolean)

  /** Decompose `e` as (attribute, additive long constant in the attr's
    * native long domain). Int and long columns both qualify — the bucket
    * arithmetic below runs in long either way (int attrs are cast at
    * bucket time), so an int band (event-time seconds, sequence ids) gets
    * the same rewrite. Timestamp columns qualify with day-time-interval
    * literal offsets, whose value IS a micros long — the same domain
    * `unix_micros` exposes at bucket time.
    */
  private def term(e: Expression): Option[(AttributeReference, Long)] = {
    def intType(a: AttributeReference): Boolean =
      a.dataType == LongType || a.dataType == IntegerType
    e match {
      case a: AttributeReference if intType(a) || a.dataType == TimestampType =>
        Some((a, 0L))
      case Add(a: AttributeReference, Literal(v: Long, LongType), _)
          if intType(a) => Some((a, v))
      case Add(Literal(v: Long, LongType), a: AttributeReference, _)
          if intType(a) => Some((a, v))
      case Subtract(a: AttributeReference, Literal(v: Long, LongType), _)
          if intType(a) => Some((a, -v))
      case Add(a: AttributeReference, Literal(v: Int, IntegerType), _)
          if intType(a) => Some((a, v.toLong))
      case Add(Literal(v: Int, IntegerType), a: AttributeReference, _)
          if intType(a) => Some((a, v.toLong))
      case Subtract(a: AttributeReference, Literal(v: Int, IntegerType), _)
          if intType(a) => Some((a, -v.toLong))
      // `t ± INTERVAL x` — the optimizer folds subtraction into a negated
      // interval literal before this batch, so Add-shape alone suffices
      case TimestampAddInterval(a: AttributeReference,
          Literal(v: Long, _: DayTimeIntervalType), _)
          if a.dataType == TimestampType => Some((a, v))
      // `d ± 30` on a DateType column — the resolver maps date + int to
      // DateAdd / date - int to DateSub; the offset is in DAYS, the same
      // unit `unix_date` exposes at bucket time
      case a: AttributeReference if a.dataType == DateType => Some((a, 0L))
      case DateAdd(a: AttributeReference, Literal(v: Int, IntegerType))
          if a.dataType == DateType => Some((a, v.toLong))
      case DateSub(a: AttributeReference, Literal(v: Int, IntegerType))
          if a.dataType == DateType => Some((a, -v.toLong))
      case _ => None
    }
  }

  /** Domain compatibility for an offset band: micros arithmetic on a
    * timestamp pairs only with a timestamp; int/long pair freely (both
    * run in long).
    */
  private def domainOf(a: AttributeReference): Int = a.dataType match {
    case TimestampType => 1 // epoch-micros
    case DateType => 2      // epoch-days
    case _ => 0             // integral
  }

  private def sameDomain(a: AttributeReference, b: AttributeReference): Boolean =
    domainOf(a) == domainOf(b)

  /** `attr` in its native long domain (no-op for long attrs; exact
    * epoch-micros for timestamps — `Cast(ts, long)` would TRUNCATE to
    * seconds and misbucket sub-second bands; epoch-days for dates, the
    * unit of DateAdd/DateSub offsets).
    */
  private def asLong(a: AttributeReference): Expression = a.dataType match {
    case LongType => a
    case TimestampType => UnixMicros(a)
    case DateType => Cast(UnixDate(a), LongType)
    case _ => Cast(a, LongType)
  }

  /** Normalize one comparison conjunct to bounds on an attribute pair:
    * `a + ca ≥ b + cb` becomes lower bound `a ≥ b + (cb − ca)` AND the
    * mirrored upper bound `b ≤ a + (ca − cb)` — both orientations are
    * recorded so the pair-matching below is orientation-free. Strict
    * bounds shrink the interval, which only helps coverage, so < and ≤
    * normalize alike.
    */
  private def bounds(e: Expression): Seq[Bound] = {
    def of(ge: Expression, le: Expression): Seq[Bound] =
      (term(ge), term(le)) match {
        case (Some((ga, gc)), Some((la, lc)))
            if ga.exprId != la.exprId && sameDomain(ga, la) =>
          Seq(Bound(ga, la, lc - gc, isLower = true),
            Bound(la, ga, gc - lc, isLower = false))
        case _ => Nil
      }
    e match {
      case GreaterThanOrEqual(a, b) => of(a, b)
      case GreaterThan(a, b) => of(a, b)
      case LessThanOrEqual(a, b) => of(b, a)
      case LessThan(a, b) => of(b, a)
      case _ => Nil
    }
  }

  /** Sign-correct floor division by a positive literal width: pmod gives
    * the non-negative remainder, the subtraction is exactly divisible, so
    * integral division equals mathematical floor for any sign of `x`.
    */
  private def floorDiv(x: Expression, width: Long): Expression = {
    val w = Literal(width, LongType)
    IntegralDivide(Subtract(x, Pmod(x, w)), w)
  }

  private def crossSide(l: LogicalPlan, r: LogicalPlan,
      a: AttributeReference, b: AttributeReference): Boolean =
    (l.outputSet.contains(a) && r.outputSet.contains(b)) ||
      (l.outputSet.contains(b) && r.outputSet.contains(a))

  override def apply(plan: LogicalPlan): LogicalPlan =
    // ANSI-only: the docstring's "overflow is a LOUD error" contract holds
    // only under ANSI arithmetic; with ANSI off the bucket math would wrap
    // silently near Long.MinValue/MaxValue and drop pairs the naive plan
    // returns. Non-ANSI sessions keep the naive plan (round-6 advice).
    if (!conf.ansiEnabled) plan else plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // ExtractEquiJoinKeys accepts ANY single-side expression pair as an
      // equi key (x = y + 5 included) — mirror that, not just attr = attr
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
        val all = conjuncts.flatMap(bounds)
          .filter(b => crossSide(left, right, b.attr, b.other))
        // first (lower, upper) pair over the same oriented attr pair
        val band = all.collectFirst(Function.unlift { (lo: Bound) =>
          if (!lo.isLower) None
          else all.collectFirst {
            case hi if !hi.isLower && hi.attr.exprId == lo.attr.exprId &&
              hi.other.exprId == lo.other.exprId &&
              hi.offset > lo.offset &&
              // width must not overflow (user literals are unbounded)
              (try { Math.subtractExact(hi.offset, lo.offset); true }
               catch { case _: ArithmeticException => false }) => (lo, hi)
          }
        })
        band match {
          case Some((lo, hi)) =>
            val width = hi.offset - lo.offset
            // orient: bounded attr on the LEFT child buckets directly;
            // the probe attr explodes to its two covering buckets
            val (bounded, probe) = (lo.attr, lo.other)
            val (boundedSide, probeSide, swapped) =
              if (left.outputSet.contains(bounded)) (left, right, false)
              else (right, left, true)
            val bAlias = Alias(floorDiv(asLong(bounded), width), "__graft_band_b")()
            val newBounded = Project(boundedSide.output :+ bAlias, boundedSide)
            val b0 = floorDiv(Add(asLong(probe), Literal(lo.offset, LongType)), width)
            val probeOut = AttributeReference(
              "__graft_band_p", LongType, nullable = true)()
            val gen = Generate(
              Explode(CreateArray(Seq(b0, Add(b0, Literal(1L, LongType))))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(probeOut), child = probeSide)
            val newCond = And(EqualTo(bAlias.toAttribute, probeOut), cond)
            val newJoin =
              if (swapped) Join(gen, newBounded, Inner, Some(newCond), hint)
              else Join(newBounded, gen, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
          case None => j
        }
      }
  }
}

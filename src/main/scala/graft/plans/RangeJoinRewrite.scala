package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Optimizer rule: rewrite a join whose condition is ONLY range
  * predicates on a timestamp (`pt >= start AND pt < end` in any
  * orientation, inclusive or strict) into the bucketed equi-join form of
  * `operators/RangeJoin` — automatically. Covers Inner always, and
  * LeftOuter/RightOuter/LeftSemi/LeftAnti when the preserved/probe side
  * is the point side (see `typeCompatible`); interval-preserved outer
  * joins log a named skip — the bucket explosion would change
  * unmatched-row multiplicity.
  *
  * Why a Rule (SURVEY.md §7.3 tier (c), the one case that earns it):
  * Spark has no equi-key to hash on in a pure range join and plans
  * BroadcastNestedLoopJoin or CartesianProduct — O(|left| × |right|)
  * comparisons, the exact shape PlanAuditSpec bans. Users writing the
  * natural `a.join(b, a("ts") >= b("lo") && a("ts") < b("hi"))` get the
  * O(n + matches) plan without knowing `RangeJoin.pointInInterval`
  * exists. Registered via `GraftExtensions`; every Verify/Bench/test
  * session runs with it.
  *
  * Rewrite (mirrors RangeJoin.pointInInterval exactly):
  *   point side    += `_graft_bucket_p = floor(unix_micros(pt) / B)`
  *   interval side += explode(sequence(bucket(lo), bucket(hi')))
  *                    (hi' = hi − 1µs when the upper bound is strict —
  *                    an interval ending ON a boundary must not claim
  *                    the next bucket)
  *   join condition = bucket equality AND the ORIGINAL predicates
  *                    (kept wholesale as the residual filter)
  * A (point, interval) pair meets only in the point's own bucket, so
  * multiplicity is unchanged; null bounds produce a null bucket/sequence
  * and drop, matching the original join's null semantics. The added
  * equi-conjunct is what the planner's ExtractEquiJoinKeys needs — the
  * next pass plans a shuffled-hash/sort-merge join, never a nested loop.
  * The rule skips joins that already have a usable equi-conjunct and is
  * fixpoint-safe (its own output contains one).
  *
  * Knobs: `spark.graft.rangeJoin.enabled` (default true),
  * `spark.graft.rangeJoin.bucketSeconds` (default 3600 — pick ≥ the
  * typical interval span; correctness holds for any value, the explosion
  * factor is ⌈span/bucket⌉ + 1).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean
  private def bucketMicros: Long =
    conf.getConfString("spark.graft.rangeJoin.bucketSeconds", "3600").toLong * 1000000L

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti, Some(_), _) =>
        rewrite(j).getOrElse(j)
    }

  /** Non-inner joins are safe exactly when the join's PRESERVED/PROBE
    * side (left for LeftOuter/LeftSemi/LeftAnti, right for RightOuter)
    * is the POINT side: the point side is never exploded, so each of its
    * rows still appears exactly once with an identical match set —
    * unmatched rows null-pad (outer) or pass/drop (semi/anti) exactly as
    * in the original join. When the preserved side is the INTERVAL side,
    * its rows are multiplied by the bucket explosion and an unmatched
    * interval would be emitted once per bucket copy — wrong multiplicity,
    * so the rule SKIPS (named log below) and Spark's nested loop stands.
    */
  private def typeCompatible(jt: JoinType, pointIsLeft: Boolean): Boolean = jt match {
    case Inner => true
    case LeftOuter | LeftSemi | LeftAnti => pointIsLeft
    case RightOuter => !pointIsLeft
    case _ => false
  }

  /** floor(us / B) as LONG — floor, not truncate-toward-zero, so
    * pre-epoch timestamps bucket correctly; the double division is exact
    * for |us| < 2^53 (± year ~2255), same domain as the DataFrame form.
    */
  private def bucketOfMicros(us: Expression): Expression =
    Cast(Floor(Divide(Cast(us, DoubleType), Literal(bucketMicros.toDouble))), LongType)

  /** (pt, bound, isLower, strictUpper) readings of one comparison */
  private def readings(c: Expression): Seq[(Expression, Expression, Boolean, Boolean)] = c match {
    case GreaterThanOrEqual(a, b) => Seq((a, b, true, false), (b, a, false, false))
    case GreaterThan(a, b)        => Seq((a, b, true, false), (b, a, false, true))
    case LessThan(a, b)           => Seq((a, b, false, true), (b, a, true, false))
    case LessThanOrEqual(a, b)    => Seq((a, b, false, false), (b, a, true, false))
    case _ => Nil
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val Join(left, right, joinType, Some(cond), hint) = j: @unchecked
    val conjuncts = splitConjunctivePredicates(cond)

    def across(l: Expression, r: Expression): Boolean = {
      def only(e: Expression, p: LogicalPlan) =
        e.references.nonEmpty && e.references.subsetOf(p.outputSet)
      (only(l, left) && only(r, right)) || (only(l, right) && only(r, left))
    }
    // an existing cross-side equi-conjunct already hash-joins; and our own
    // output contains one, which makes the rule fixpoint-safe
    val hasEqui = conjuncts.exists {
      case EqualTo(l, r) => across(l, r)
      case EqualNullSafe(l, r) => across(l, r)
      case _ => false
    }
    if (hasEqui) return None

    // find a timestamp attribute of ONE side that is lower- AND
    // upper-bounded by expressions of the OTHER side
    val cands = conjuncts.flatMap(readings)
    def boundsFor(ptSide: LogicalPlan, ivSide: LogicalPlan): Option[(Attribute, Expression, Expression, Boolean)] = {
      val pts = cands.collect {
        case (pt: AttributeReference, bound, isLower, strict)
            if pt.dataType == TimestampType && ptSide.outputSet.contains(pt) &&
              bound.references.nonEmpty && bound.references.subsetOf(ivSide.outputSet) &&
              bound.dataType == TimestampType =>
          (pt, bound, isLower, strict)
      }
      for {
        (pt, lo, _, _) <- pts.find(_._3)
        (_, hi, _, strict) <- pts.find(p => !p._3 && p._1.semanticEquals(pt))
      } yield (pt, lo, hi, strict)
    }

    val (pointIsLeft, pt, lo, hi, strictHi) =
      boundsFor(left, right).map { case (p, l, h, s) => (true, p, l, h, s) }
        .orElse(boundsFor(right, left).map { case (p, l, h, s) => (false, p, l, h, s) })
        .getOrElse(return None)

    if (!typeCompatible(joinType, pointIsLeft)) {
      logInfo(s"graft.RangeJoinRewrite: SKIP — $joinType range join with the " +
        "preserved side on the interval side; the bucket explosion would change " +
        "unmatched-row multiplicity. Rewrite the query with the point side preserved, " +
        "or accept the nested-loop plan.")
      return None
    }

    val (pointPlan, ivPlan) = if (pointIsLeft) (left, right) else (right, left)

    val ptBucket = Alias(bucketOfMicros(UnixMicros(pt)), "_graft_bucket_p")()
    val pointProj = Project(pointPlan.output :+ ptBucket, pointPlan)

    val hiMicros =
      if (strictHi) Subtract(UnixMicros(hi), Literal(1L)) else UnixMicros(hi)
    val seq = Sequence(bucketOfMicros(UnixMicros(lo)), bucketOfMicros(hiMicros),
      None, Some(conf.sessionLocalTimeZone))
    val ivBucket = AttributeReference("_graft_bucket_i", LongType,
      nullable = seq.dataType.containsNull)()
    val ivGen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(ivBucket), child = ivPlan)

    val newCond = And(EqualTo(ptBucket.toAttribute, ivBucket), cond)
    val newJoin =
      if (pointIsLeft) Join(pointProj, ivGen, joinType, Some(newCond), hint)
      else Join(ivGen, pointProj, joinType, Some(newCond), hint)
    Some(Project(j.output, newJoin))
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

/** Optimizer rule: rewrite an inner join whose only cross-side condition
  * is `levenshtein(l, r) <= d` into a q-gram-blocked equi-join —
  * automatically. The naive formulation has no equi key, so Spark plans
  * BroadcastNestedLoopJoin / CartesianProduct: O(|L|·|R|) edit-distance
  * evaluations, the shape PlanAuditSpec bans. This is the fuzzy-join
  * sibling of `RangeJoinRewrite` (SURVEY.md §7.3 tier (c)): users who
  * write the natural predicate get `operators/FuzzyJoin`'s candidate
  * plan without knowing it exists.
  *
  * Rewrite — ONE join, each side exploding a unified key column:
  *  - gram keys `g:<gram>`: the side's distinct q-grams. Any pair within
  *    edit distance d with max(len) ≥ q·(d+1) shares a gram (an edit
  *    changes ≤ q grams' content; the longer side has > d·q grams).
  *  - length keys `l:<n>` (only for strings with len < q·(d+1)): the
  *    left side emits len−d … len+d, the right side emits exactly its
  *    own length — a short-short pair meets iff |Δlen| ≤ d (necessary
  *    for distance ≤ d), and meets exactly once.
  * A pair could meet on several keys, so the residual keeps EXACTLY one
  * meeting — the minimal common gram for max(len) ≥ q·(d+1) pairs, the
  * single length key otherwise — which preserves inner-join pair
  * multiplicity. The ORIGINAL condition stays in the residual, so
  * false candidates (shared gram, distance > d) still drop; NULL/empty
  * strings explode to no keys or meet through length keys, matching the
  * original null-rejecting inner semantics.
  *
  * Inner and LeftSemi joins. Inner explodes both sides with the
  * meet-once residual. LeftSemi tolerates the rewrite WITHOUT the
  * residual — existence semantics absorb duplicate meetings — via
  * collapse-match-expand: aggregate the left to distinct tuples with a
  * count, run the blocked INNER join, dedupe the matched tuples, and
  * re-expand each by its count (`explode(sequence(1, cnt))`), which
  * reproduces per-instance semi multiplicity exactly and stays fully
  * deterministic (no row-id tagging). Outer/anti joins keep their
  * nested loop (named skip logged): an anti join's "no key meets"
  * cannot be expressed through exploded keys without the same collapse
  * on the MISSING side, which double-negates into a set-difference the
  * optimizer cannot guarantee cheap. The
  * rule's own output contains a cross-side equi-conjunct, making it
  * fixpoint-safe, and joins that already have one are left alone. The
  * rule has no gram-frequency cap (a rewrite cannot aggregate);
  * boilerplate-heavy corpora should call `FuzzyJoin.bestMatch` with its
  * `maxGramDf` instead — same stance as RangeJoinRewrite's bucket knob.
  *
  * Knobs: `spark.graft.fuzzyJoin.enabled` (default true),
  * `spark.graft.fuzzyJoin.q` (default 3), max rewritten distance 8
  * (the length-key fan-out is 2d+1; past that the gram filter is too
  * weak to help anyway).
  */
object FuzzyJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.fuzzyJoin.enabled", "true").toBoolean
  private def q: Int =
    conf.getConfString("spark.graft.fuzzyJoin.q", "3").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(_, _, _, Some(_), _) => rewrite(j).getOrElse(j)
    }

  /** (levExpr, leftStr, rightStr, d) for `levenshtein(a, b) <= d` in any
    * orientation; LessThan normalizes to d−1. */
  private def levReading(c: Expression): Option[(Expression, Expression, Int)] = {
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) => Some(v.toInt)
      case _ => None
    }
    c match {
      case LessThanOrEqual(Levenshtein(a, b, _), l) => lit(l).map(d => (a, b, d))
      case LessThan(Levenshtein(a, b, _), l) => lit(l).map(d => (a, b, d - 1))
      case GreaterThanOrEqual(l, Levenshtein(a, b, _)) => lit(l).map(d => (a, b, d))
      case GreaterThan(l, Levenshtein(a, b, _)) => lit(l).map(d => (a, b, d - 1))
      case _ => None
    }
  }

  private def emptyStrArray: Expression =
    Literal.create(Array.empty[String], ArrayType(StringType))

  /** distinct q-grams of `s` as array<string>; empty below q chars
    * (sequence(1, 0) is DESCENDING — the repo's standard guard). */
  private def gramsOf(s: Expression): Expression = {
    val i = NamedLambdaVariable("i", IntegerType, nullable = false)
    val seq = Sequence(Literal(1), Subtract(Length(s), Literal(q - 1)), None,
      Some(conf.sessionLocalTimeZone))
    val tf = ArrayTransform(seq, LambdaFunction(Substring(s, i, Literal(q)), Seq(i)))
    If(GreaterThanOrEqual(Length(s), Literal(q)), ArrayDistinct(tf), emptyStrArray)
  }

  private def prefixed(prefix: String, e: Expression): Expression =
    Concat(Seq(Literal(prefix), e))

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val Join(left, right, joinType, Some(cond), hint) = j: @unchecked
    val conjuncts = splitConjunctivePredicates(cond)

    def onlyIn(e: Expression, p: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    def across(l: Expression, r: Expression): Boolean =
      (onlyIn(l, left) && onlyIn(r, right)) || (onlyIn(l, right) && onlyIn(r, left))

    // an existing cross-side equi-conjunct already hash-joins; our own
    // output contains one → fixpoint-safe
    val hasEqui = conjuncts.exists {
      case EqualTo(l, r) => across(l, r)
      case EqualNullSafe(l, r) => across(l, r)
      case _ => false
    }
    if (hasEqui) return None

    // one deterministic string expression per side under a lev bound
    val reading = conjuncts.flatMap(levReading).collectFirst {
      case (a, b, d) if d >= 0 && d <= 8 && a.deterministic && b.deterministic &&
          a.dataType == StringType && b.dataType == StringType &&
          onlyIn(a, left) && onlyIn(b, right) => (a, b, d)
      case (a, b, d) if d >= 0 && d <= 8 && a.deterministic && b.deterministic &&
          a.dataType == StringType && b.dataType == StringType &&
          onlyIn(b, left) && onlyIn(a, right) => (b, a, d)
    }
    val (el, er, d) = reading.getOrElse(return None)

    if (joinType != Inner && joinType != LeftSemi) {
      logInfo(s"graft.FuzzyJoinRewrite: SKIP — $joinType fuzzy join; a preserved " +
        "or negated side cannot tolerate the key explosion. " +
        "Use operators/FuzzyJoin for argmax semantics, or accept the nested loop.")
      return None
    }

    val thresh = q * (d + 1)

    def sideKeys(s: Expression, isLeft: Boolean): (Expression, Expression) = {
      val grams = gramsOf(s)
      val g = NamedLambdaVariable("g", StringType, nullable = false)
      val gramKeys = ArrayTransform(grams, LambdaFunction(prefixed("g:", g), Seq(g)))
      val lenKeys =
        if (isLeft) {
          val dl = NamedLambdaVariable("dl", IntegerType, nullable = false)
          ArrayTransform(
            Sequence(Literal(-d), Literal(d), None, Some(conf.sessionLocalTimeZone)),
            LambdaFunction(
              prefixed("l:", Cast(Add(Length(s), dl), StringType)), Seq(dl)))
        } else {
          CreateArray(Seq(prefixed("l:", Cast(Length(s), StringType))))
        }
      val keys = If(LessThan(Length(s), Literal(thresh)),
        ArrayUnion(gramKeys, lenKeys), gramKeys)
      (grams, keys)
    }

    val (gramsL, keysL) = sideKeys(el, isLeft = true)
    val (gramsR, keysR) = sideKeys(er, isLeft = false)

    // LeftSemi: collapse the left to distinct tuples + count BEFORE the
    // blocked join, so the existence check runs once per distinct tuple
    // and the count re-expands instance multiplicity afterwards
    val (leftBase, cntAttr) =
      if (joinType == LeftSemi) {
        val cntAlias = Alias(Count(Literal(1)).toAggregateExpression(), "_graft_cnt")()
        (Aggregate(left.output, left.output :+ cntAlias, left): LogicalPlan,
          Some(cntAlias.toAttribute))
      } else (left, None)

    val glAlias = Alias(gramsL, "_graft_grams_l")()
    val klAlias = Alias(keysL, "_graft_keys_l")()
    val grAlias = Alias(gramsR, "_graft_grams_r")()
    val krAlias = Alias(keysR, "_graft_keys_r")()
    val leftProj = Project(leftBase.output ++ Seq(glAlias, klAlias), leftBase)
    val rightProj = Project(right.output ++ Seq(grAlias, krAlias), right)

    val gkL = AttributeReference("_graft_gk_l", StringType, nullable = true)()
    val gkR = AttributeReference("_graft_gk_r", StringType, nullable = true)()
    val leftGen = Generate(Explode(klAlias.toAttribute), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(gkL), child = leftProj)
    val rightGen = Generate(Explode(krAlias.toAttribute), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(gkR), child = rightProj)

    val maxLen = Greatest(Seq(Length(el), Length(er)))
    // exactly one meeting per pair: the minimal common gram when the
    // gram guarantee applies, the single length key otherwise
    val meetOnce = Or(
      And(
        And(StartsWith(gkL, Literal("g:")),
          GreaterThanOrEqual(maxLen, Literal(thresh))),
        EqualTo(gkL,
          prefixed("g:", ArrayMin(ArrayIntersect(glAlias.toAttribute, grAlias.toAttribute))))),
      And(StartsWith(gkL, Literal("l:")), LessThan(maxLen, Literal(thresh))))

    if (joinType == Inner) {
      val newCond = And(EqualTo(gkL, gkR), And(meetOnce, cond))
      val newJoin = Join(leftGen, rightGen, Inner, Some(newCond), hint)
      Some(Project(j.output, newJoin))
    } else {
      // LeftSemi: duplicate meetings are absorbed by the match-dedupe
      // aggregate, so the meet-once residual (and its ArrayIntersect per
      // candidate) is unnecessary work — drop it
      val newCond = And(EqualTo(gkL, gkR), cond)
      val newJoin = Join(leftGen, rightGen, Inner, Some(newCond), hint)
      val matchedCols: Seq[NamedExpression] = left.output :+ cntAttr.get
      val matched = Aggregate(matchedCols, matchedCols, newJoin)
      val idx = AttributeReference("_graft_i", LongType)()
      val expanded = Generate(
        Explode(Sequence(Literal(1L), cntAttr.get, None, Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(idx), child = matched)
      Some(Project(j.output, expanded))
    }
  }
}

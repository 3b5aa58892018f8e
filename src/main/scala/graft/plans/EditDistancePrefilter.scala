package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule for edit-distance predicates — the fuzzy-join
  * optimization entity resolution lives on (`levenshtein(a, b) <= k`
  * inside blocked candidate scoring, [[graft.operators.EntityResolution]]).
  *
  * Two correctness-preserving rewrites of each top-level conjunct
  * `levenshtein(a, b) <= k` (and the `<`/flipped forms), k a
  * non-negative int literal:
  *
  *  1. '''Length prefilter''': conjoin `abs(length(a) - length(b)) <= k`
  *     — a true lower bound on edit distance, O(1) vs O(|a|·|b|), so
  *     codegen's short-circuit AND skips the DP matrix for the bulk of
  *     candidate pairs whose lengths already disagree.
  *  2. '''Threshold pushdown''': replace the unbounded distance with
  *     Spark's banded form `levenshtein(a, b, k)` (returns -1 when the
  *     distance exceeds k), testing `>= 0` — the banded DP visits a
  *     2k+1-wide diagonal strip, O(k·min(|a|,|b|)) instead of
  *     O(|a|·|b|).
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * (see [[graft.GraftExtensions]]), so it applies to Column-API and SQL
  * plans alike. The rule runs inside the operator-optimization fixpoint
  * batch: idempotence comes from (a) matching only threshold-LESS
  * Levenshtein nodes — the rewritten conjunct carries a threshold and
  * cannot rematch — and (b) a semantic-equality check before adding a
  * guard that is already present. Null semantics are unchanged: a null
  * operand nulls both the guard and the original predicate, and the
  * filter drops the row either way. */
object EditDistancePrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** (left, right, k) for a conjunct of the form lev(a,b) ≤ k. */
  private def boundedLev(e: Expression)
      : Option[(Expression, Expression, Int)] = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) =>
      Some((a, b, k))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) =>
      Some((a, b, k))
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) =>
      Some((a, b, k - 1))
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) =>
      Some((a, b, k - 1))
    case _ => None
  }

  private def lengthGuard(a: Expression, b: Expression, k: Int): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))),
      Literal(k, IntegerType))

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(a, b, Some(Literal(k, IntegerType))),
      Literal(0, IntegerType))

  /** Rewritten condition, or None when nothing matched. */
  private def rewriteCondition(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val rewritten = conjuncts.map { c =>
      boundedLev(c) match {
        case Some((a, b, k)) if k >= 0 => banded(a, b, k)
        case _ => c
      }
    }
    val guards = conjuncts.flatMap(boundedLev).collect {
      case (a, b, k) if k >= 0 => lengthGuard(a, b, k)
    }.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (guards.isEmpty && rewritten == conjuncts) None
    else Some((guards ++ rewritten).reduce(And))
  }

  // Join conditions too: PushPredicateThroughJoin pulls a post-join
  // `lev <= k` filter into the join condition (exactly what happens to
  // the ER blocked-scoring predicate), so a Filter-only rule would
  // never see the hot path.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      rewriteCondition(cond).map(c => f.copy(condition = c)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      rewriteCondition(cond).map(c => j.copy(condition = Some(c)))
        .getOrElse(j)
  }
}

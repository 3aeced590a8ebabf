package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression,
  GreaterThanOrEqual, LessThan, LessThanOrEqual, Length, Levenshtein,
  Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: strength-reduce unbounded edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic program
  * for every row and then throws the distance away; at 100 TB the k-banded
  * DP (Spark's 3-arg `levenshtein(a, b, k)`, O(k·|a|)) plus the lossless
  * length-gap prefilter (`abs(length(a) − length(b)) > k` ⇒ distance > k,
  * so rows short-circuit before any DP runs) is the difference between a
  * feasible fuzzy join and an unusable one — q101 applies both BY HAND
  * (`Relational.scala`); this rule applies them automatically to any
  * user's naive predicate, the way Catalyst's own
  * InferFiltersFromConstraints adds derived predicates.
  *
  * Rewrite (k a non-negative foldable int literal, inner levenshtein
  * unbounded):
  *   `lev(a,b) <= k`  →  `abs(len(a)−len(b)) <= k AND lev(a,b,k) >= 0`
  *   `lev(a,b) <  k`  →  same with k−1 as the threshold
  * Semantics preserved exactly: the banded form returns the distance when
  * ≤ threshold and −1 otherwise, so `>= 0` ⟺ `distance <= threshold`;
  * NULL inputs propagate NULL through both conjuncts exactly as through
  * the original predicate (AND(null, null) = null = original).
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`) for
  * sessions built with the extension, or
  * `spark.experimental.extraOptimizations` on an existing session.
  * PlanSpec pins that the rewrite fires and that results are unchanged.
  */
object BoundedLevenshteinPrefilter extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Int): Expression = {
    val kLit = Literal(k)
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), kLit),
      GreaterThanOrEqual(Levenshtein(a, b, Some(kLit)), Literal(0)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond transformUp {
        case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
            if k >= 0 =>
          bounded(a, b, k)
        case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
            if k >= 0 =>
          bounded(a, b, k)
        case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
            if k >= 1 =>
          bounded(a, b, k - 1)
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a Levenshtein distance compared against a small
  * integer literal never needs the full O(n·m) DP — rewrite
  * `levenshtein(a, b) <= k` (and the <, mirrored variants) to the
  * banded [[BoundedLevenshtein]], which visits only the 2k+1 diagonal
  * band and early-exits (O(k·n)). Value semantics are identical:
  * bounded(a, b, k) = min(levenshtein(a, b), k+1), so every comparison
  * against k is preserved, including NULL propagation.
  *
  * This is the (b)-tier extension story end to end: users write the
  * builtin, Catalyst swaps in the cheaper expression — the same
  * contract as Spark's own `Levenshtein(..., threshold)` pushdown for
  * its SQL threshold form, extended to plain comparisons.
  *
  * Registered via `GraftExtensions` as a PRE-CBO rule (a run-ONCE
  * batch), NOT injectOptimizerRule: the operator-optimization batch is
  * a fix-point loop, so a rule there re-traverses every expression of
  * every plan per iteration — measured +6 s staging / +13 s streaming
  * at sf0.1 on the wide TaskRouter plans (thousands of expression
  * nodes, re-optimized per micro-batch). The rewrite is single-pass
  * and idempotent; Once placement keeps it free.
  */
object BoundLevenshteinRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev <= k  ⟺  bounded_k <= k        (k ≥ 0)
      case LessThanOrEqual(Levenshtein(a, b, None), lit @ Literal(k: Int, IntegerType))
          if k >= 0 =>
        LessThanOrEqual(BoundedLevenshtein(a, b, k), lit)
      // lev < k  ⟺  bounded_{k-1} < k      (k ≥ 1)
      case LessThan(Levenshtein(a, b, None), lit @ Literal(k: Int, IntegerType))
          if k >= 1 =>
        LessThan(BoundedLevenshtein(a, b, k - 1), lit)
      // k >= lev  ⟺  k >= bounded_k
      case GreaterThanOrEqual(lit @ Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 =>
        GreaterThanOrEqual(lit, BoundedLevenshtein(a, b, k))
      // k > lev  ⟺  k > bounded_{k-1}
      case GreaterThan(lit @ Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 =>
        GreaterThan(lit, BoundedLevenshtein(a, b, k - 1))
    }
}

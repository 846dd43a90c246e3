package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression,
  GreaterThanOrEqual, Length, LessThan, LessThanOrEqual, Levenshtein, Literal,
  Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Semantics-preserving optimizer rule: a filter `levenshtein(a, b) <= k`
  * (unbounded full-matrix DP, O(|a|·|b|) per row) becomes
  *
  *   abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0
  *
  * — the cheap length guard short-circuits rows no edit script of length k
  * can relate (length difference is a lower bound on edit distance), and
  * the THRESHOLD form runs Spark's banded early-exit DP (O(k·min(|a|,|b|))
  * and abandons the row the moment the running minimum exceeds k; it
  * returns -1 past the threshold, so `>= 0` is exactly `distance <= k`).
  *
  * This automates, for anyone writing plain SQL against the engine, the
  * staging that `Dedup.editDistancePairs` applies by hand — the round-6
  * lesson where the unbounded verify cost 102 s against ~5 s staged.
  *
  * Scope and safety:
  *  - only `<=` / `<` against a non-negative INT LITERAL rewrite (a column
  *    threshold would re-plan the guard per row for no gain);
  *  - the 3-arg form it produces never matches the pattern again, so the
  *    rule is idempotent under the optimizer's fixed-point driver;
  *  - NULL propagation is unchanged: every produced conjunct is null iff
  *    an input string is null, and `null AND null = null` filters exactly
  *    like the original null comparison.
  */
object ThresholdLevenshteinRule extends Rule[LogicalPlan] {

  private def guarded(a: Expression, b: Expression, k: Int): Expression = {
    val kLit = Literal(k)
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), kLit),
      GreaterThanOrEqual(Levenshtein(a, b, Some(kLit)), Literal(0)))
  }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 0 =>
      guarded(a, b, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 0 =>
      guarded(a, b, k)
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 1 =>
      guarded(a, b, k - 1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val next = rewrite(cond)
      if (next fastEquals cond) f else f.copy(condition = next)
  }
}
